#!/bin/bash
# Canonical SCAT training run (reference script/ablation_pose.sh:5),
# flag-for-flag against the TPU framework.
python -m scat_tpu.train --net reg_transformer --batch_size 96 --lr 5e-4 \
  --epoch 40 --stage 3 --l_weight_3d 100000 --l_weight_2d 10 \
  --vit_heads 8 --iteration 3 --pos_embed True --mask_rate 0.2 --debug True
