#!/bin/bash
# Round-5 train-time hparam ladder (VERDICT r4 #4) — split out of
# final_round5.sh so the headline/stack/bench work could run first; launch
# this once the device is free again.  8-epoch controlled runs from
# scratch on the hardened 20k split; each scored post-hoc with
# test.icp_refine=false PINNED so the ladder is comparable to prod40's
# no-ICP 0.8811 baseline (the serving default flipped to icp on mid-round).
#
# Launch detached:
#   setsid nohup bash scripts/hp_ladder_r5.sh >> /tmp/hp_ladder.log 2>&1 \
#       < /dev/null & echo started
set -u
cd "$(dirname "$0")/.."
source scripts/detached_lib.sh

VAL="dataset.root=data_synth dataset.test.name=shapenet6d dataset.test.split=val"
TRAIN="dataset.root=data_synth dataset.train.split=train dataset.test.name=shapenet6d dataset.test.split=val"
HP_COMMON="$TRAIN training.n_epochs=8 training.freq_save=4 training.freq_valid=100 resume_ckpt=none"

echo "=== hp_ladder_r5 $(date -u +%FT%TZ) ==="
for spec in \
    "hp5ctrl:" \
    "hp5lr:optimization.lr=2e-3" \
    "hp5feat:loss.w.pos=1.0 loss.w.neg=1.0" \
    "hp5corr:dataset.max_corrs=1000" \
; do
    name=${spec%%:*}; ov=${spec#*:}
    rm -rf "exp_data/$name"   # drop any partial dir from a killed attempt
    run_step train_$name 14400 python run_train.py exp_name=$name $HP_COMMON $ov
    run_step sweep_$name 7200 python scripts/sweep_checkpoints.py \
        exp_name=$name $VAL test.icp_refine=false
    SW=$(newest_since sweep_$name "exp_data/$name/results/ckpt_sweep_*.json") || exit 1
    echo "HP_SWEEP $name = $SW  (overrides: '$ov')"
done
echo "=== HP_LADDER SUMMARY: exp_data/hp5*/results/ckpt_sweep_*.json vs hp5ctrl"
echo "=== done ==="
