#!/bin/bash
# Ablation grid over masking/PE/PL-reg (reference script/ablation_relation.sh:2-6).
COMMON="--net reg_transformer --batch_size 96 --lr 5e-4 --epoch 40 --stage 3 \
  --l_weight_3d 100000 --l_weight_2d 10 --vit_heads 8 --iteration 3"
python -m scat_tpu.train $COMMON --pos_embed True  --mask_rate 0.2
python -m scat_tpu.train $COMMON --pos_embed False --mask_rate 0.2
python -m scat_tpu.train $COMMON --pos_embed True  --mask_rate 0.0
python -m scat_tpu.train $COMMON --pos_embed True  --mask_rate 0.2 --pl_reg True
