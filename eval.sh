#!/bin/bash
# Benchmark evaluation (reference eval.sh:5).
python -m scat_tpu.eval --net reg_transformer --batch_size 32 \
  --eval_dataset STB --checkpoint_path_eval experiments/0207_iccv_1/hand_net_final \
  --result_dir ./output/eval/ --vit_heads 8 --iteration 3 --pos_embed True
