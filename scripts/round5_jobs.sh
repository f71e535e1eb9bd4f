#!/bin/bash
# Round-5 device job chain — VERDICT r4 items 1b (GT-corrs ladder rung),
# 3 (icp_refine A/B), 2 (unfrozen-tower fine-tune, now with gradient
# accumulation), 4 (train-time hparam ladder).  One serial chain: the
# single v5e chip and the 1-core host make concurrent jobs strictly
# slower (CLAUDE.md).
#
# Launch detached:
#   setsid nohup bash scripts/round5_jobs.sh >> /tmp/round5_jobs.log 2>&1 \
#       < /dev/null & echo $! > /tmp/round5_jobs.pid
#
# Every step goes through run_step (abort-on-failure, scripts/detached_lib.sh)
# — a SUMMARY line can never cite a stale file (round-4 provenance lesson).
set -u
cd "$(dirname "$0")/.."
source scripts/detached_lib.sh

EXP=exp_data/prod40
RDIR=$EXP/results
PAIR_GLOB="$RDIR/shapenet6d_val_*.json"
VAL="dataset.root=data_synth dataset.test.name=shapenet6d dataset.test.split=val"
TRAIN="dataset.root=data_synth dataset.train.split=train dataset.test.name=shapenet6d dataset.test.split=val"
BEST=29   # prod40 best epoch (ckpt_sweep_20082026_0713.json)

echo "=== round5_jobs $(date -u +%FT%TZ) ==="

# ---------------------------------------------------------------- stage 1
# GT-corrs ladder rung (re-run of the crashed finish_prod40 step 4a):
# bf16 strict parity + debug_valid=true (GT correspondences feed the
# solver; isolates the solver ceiling — reference configs/config.yaml:11)
GT_DONE="$RDIR/shapenet6d_val_all_20082026_1031.json"  # first chain attempt
if [ -f "$GT_DONE" ]; then
    GT_JSON=$GT_DONE   # rung already measured this round; don't redo it
else
    run_step gt_rung 3600 python run_test.py exp_name=prod40 $VAL \
        eval.ckpt=$BEST model.quant=none debug_valid=true
    GT_JSON=$(newest_since gt_rung "$PAIR_GLOB") || exit 1
fi
echo "LADDER_GT=$GT_JSON"

# ---------------------------------------------------------------- stage 2
# icp_refine A/B on the best epoch, serving defaults (int8 tower, pointdsc)
# — baseline is a fresh default run (same process protocol as the variant).
run_step icp_base 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST
ICP_BASE=$(newest_since icp_base "$PAIR_GLOB") || exit 1
run_step icp_on 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    test.icp_refine=true
ICP_ON=$(newest_since icp_on "$PAIR_GLOB") || exit 1
run_step icp_ci 600 bash -c "set -o pipefail; python scripts/bootstrap_ci.py '$ICP_BASE' '$ICP_ON' | tee /tmp/icp_ci.txt"
# second variant: bigger clouds, harder trim
run_step icp_v2 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    test.icp_refine=true test.icp_points=1024 test.icp_trim=0.6
ICP_V2=$(newest_since icp_v2 "$PAIR_GLOB") || exit 1
run_step icp_ci2 600 bash -c "set -o pipefail; python scripts/bootstrap_ci.py '$ICP_BASE' '$ICP_V2' | tee /tmp/icp_ci2.txt"

# ---------------------------------------------------------------- stage 3
# unfrozen-tower fine-tune, effective B=32 via gradient accumulation.
# Probe FIRST with the trainer-exact resident set (probe_train_towers now
# mirrors run_train: 224x224, text_emb path, device augs, donate).
FIT=""
for BA in "32 4" "16 4" "16 8"; do
    set -- $BA
    echo "--- probe B=$1 accum=$2"
    if timeout 3600 python scripts/probe_train_towers.py $1 $2; then
        FIT_B=$1; FIT_A=$2; FIT=yes
        break
    fi
    echo "--- B=$1 accum=$2 does not fit"
done
if [ -z "$FIT" ]; then
    echo "!!! no (B, accum) fits — skipping fine-tune, continuing to stage 4"
else
    echo "=== PROBE_FIT B=$FIT_B accum=$FIT_A"
    rm -rf exp_data/prod40tt   # r4 left a dangling config-only dir
    run_step towerft 28800 python run_train.py exp_name=prod40tt $TRAIN \
        model.train_towers=true init_params_from=prod40:$BEST \
        dataset.batch_size=$FIT_B training.accum_steps=$FIT_A \
        optimization.lr=1e-4 training.n_epochs=6 \
        training.freq_valid=2 resume_ckpt=none
    run_step towerft_sweep 7200 python scripts/sweep_checkpoints.py \
        exp_name=prod40tt $VAL
    TT_SWEEP=$(newest_since towerft_sweep "exp_data/prod40tt/results/ckpt_sweep_*.json") || exit 1
    echo "TOWERFT_SWEEP=$TT_SWEEP (compare vs prod40 240-pair AR 0.8811)"
fi

# ---------------------------------------------------------------- stage 4
# train-time hparam ladder: 8-epoch controlled runs from scratch on the
# hardened 20k split (VERDICT r4 #4 — only eval-time knobs were ever
# swept; reference configs/config.yaml:42-51).  freq_valid=100 skips
# in-trainer valid (the post-hoc sweep scores the saved checkpoints);
# freq_save=4 saves epochs 3 and 7.
HP_COMMON="$TRAIN training.n_epochs=8 training.freq_save=4 training.freq_valid=100 resume_ckpt=none"
for spec in \
    "hp5ctrl:" \
    "hp5lr:optimization.lr=2e-3" \
    "hp5feat:loss.w.pos=1.0 loss.w.neg=1.0" \
    "hp5corr:dataset.max_corrs=1000" \
; do
    name=${spec%%:*}; ov=${spec#*:}
    run_step train_$name 14400 python run_train.py exp_name=$name $HP_COMMON $ov
    run_step sweep_$name 7200 python scripts/sweep_checkpoints.py \
        exp_name=$name $VAL
    SW=$(newest_since sweep_$name "exp_data/$name/results/ckpt_sweep_*.json") || exit 1
    echo "HP_SWEEP $name = $SW  (overrides: '$ov')"
done

echo "=== ROUND5_JOBS SUMMARY $(date -u +%FT%TZ) ==="
echo "gt_rung: $GT_JSON"
echo "icp A/B: base=$ICP_BASE icp=$ICP_ON ci=/tmp/icp_ci.txt v2=$ICP_V2 ci2=/tmp/icp_ci2.txt"
echo "towerft: ${TT_SWEEP:-SKIPPED (no fit)}"
echo "hparams: exp_data/hp5*/results/ckpt_sweep_*.json vs hp5ctrl"
echo "=== done ==="
