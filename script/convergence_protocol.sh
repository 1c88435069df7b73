#!/bin/bash
# The pinned multi-seed convergence protocol (benchmarks/RESULTS.md
# "convergence" sections): canonical config (script/ablation_pose.sh
# flags) on the synthetic task for seeds 2/3/1 plus the 166-wide
# frei-layout seed-2 run, each evaluated on hand_net_final at THREE
# eval seeds (123/77/31) — a single eval seed moves PA-MPJPE by up to
# +-1.5 mm (RESULTS.md "eval-seed sensitivity"), so ratchet rows are
# mean +- spread over the three.  Add a pl_reg row with:
#   run_one seed2_pl 2 stb --pl_reg True  (pass extra flags through)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
TRAIN_FLAGS="--net reg_transformer --batch_size 96 --lr 5e-4 --epoch 40 \
  --stage 3 --l_weight_3d 100000 --l_weight_2d 10 --vit_heads 8 \
  --iteration 3 --pos_embed True --mask_rate 0.2 --synthetic_data True \
  --steps_per_epoch 160"
EVAL_FLAGS="--net reg_transformer --batch_size 96 --vit_heads 8 \
  --iteration 3 --pos_embed True --synthetic_data True"
EVAL_SEEDS="123 77 31"

eval_multiseed () {  # $1=tag $2=layout $3=ckpt [extra flags...]
  local tag=$1 layout=$2 ckpt=$3; shift 3
  local out=output/convergence/$tag
  mkdir -p "$out"
  for es in $EVAL_SEEDS; do
    timeout 1200 python -u -m scat_tpu.eval $EVAL_FLAGS --seed "$es" \
        --synthetic_layout "$layout" "$@" \
        --checkpoint_path_eval "$ckpt" \
        --result_dir "$out/eval_s$es" > "$out/eval_s$es.log" 2>&1
    echo "=== $tag eval seed=$es rc=$? $(date +%T)"
    grep -E "^MPJPE|^AUC" "$out/eval_s$es.log" | tail -2
  done
}

run_one () {  # $1=tag $2=seed $3=layout [extra flags...]
  local tag=$1 seed=$2 layout=$3; shift 3
  local out=output/convergence/$tag
  mkdir -p "$out"
  echo "=== $tag train start $(date +%T)"
  timeout 3600 python -u -m scat_tpu.train $TRAIN_FLAGS --seed "$seed" \
      --synthetic_layout "$layout" "$@" \
      --checkpoint_folder "$out" > "$out/train.log" 2>&1
  echo "=== $tag train rc=$? $(date +%T)"
  eval_multiseed "$tag" "$layout" "$out/hand_net_final" "$@"
}

run_one seed2 2 stb
run_one seed3 3 stb
run_one seed1 1 stb
run_one seed2_frei 2 frei
echo "ALL DONE"
