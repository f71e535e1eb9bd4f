#!/bin/bash
# Round-5 endgame takeover.  round5_jobs.sh runs [towerft -> hparam ladder]
# serially, which would push the 2000-pair ICP headline (queued behind it in
# after_round5_jobs.sh) past the end of the round if the TPU pool slows
# down.  This script waits for the prod40tt fine-tune + checkpoint sweep to
# finish, kills the REMAINDER of the chain by explicit pids (never by
# pattern), and runs the remaining device work in PRIORITY order:
#
#   1. 2000-pair headline with the measured-best ICP knobs + bootstrap CI
#   2. stacked eval knobs on the 240-pair val (cheap)
#   3. train-time hparam ladder (ctrl, lr, feat, corr) — each run scored
#      with test.icp_refine=false PINNED so the ladder stays comparable to
#      prod40's 0.8811 no-ICP baseline even after the serving default flips
#
# If the round ends mid-ladder, everything above the cut line is already
# measured and transcribed.
#
# Launch detached (replaces after_round5_jobs.sh — kill its waiter first):
#   setsid nohup bash scripts/final_round5.sh >> /tmp/final_r5.log 2>&1 \
#       < /dev/null & echo started
set -u
cd "$(dirname "$0")/.."
source scripts/detached_lib.sh

CHAIN_LOG=/tmp/round5_jobs.log
CHAIN_PID=$(cat /tmp/round5_jobs.pid)

EXP=exp_data/prod40
RDIR=$EXP/results
PAIR_GLOB="$RDIR/shapenet6d_val_*.json"
VAL2K="dataset.root=data_synth2k dataset.test.name=shapenet6d dataset.test.split=val"
VAL="dataset.root=data_synth dataset.test.name=shapenet6d dataset.test.split=val"
TRAIN="dataset.root=data_synth dataset.train.split=train dataset.test.name=shapenet6d dataset.test.split=val"
BEST=29
OLD_HEADLINE=$RDIR/shapenet6d_val_all_20082026_0717.json  # r4 headline, icp off
ICPV2="test.icp_refine=true test.icp_points=1024 test.icp_trim=0.6"

echo "=== final_round5 $(date -u +%FT%TZ): waiting for towerft_sweep / chain exit"
while kill -0 "$CHAIN_PID" 2>/dev/null \
      && ! grep -q "STEP towerft_sweep ok\|ABORTING JOB\|=== done ===" "$CHAIN_LOG" 2>/dev/null; do
    sleep 120
done

if kill -0 "$CHAIN_PID" 2>/dev/null; then
    echo "=== taking over from chain pid $CHAIN_PID $(date -u +%FT%TZ)"
    # kill the chain's process tree by explicit pids (chain -> timeout -> python)
    for child in $(ps -o pid= --ppid "$CHAIN_PID"); do
        for gc in $(ps -o pid= --ppid "$child"); do kill "$gc" 2>/dev/null; done
        kill "$child" 2>/dev/null
    done
    kill "$CHAIN_PID" 2>/dev/null
    sleep 5
    # the chain may have just started an hp5 run between the sweep finishing
    # and the kill — remove any partial experiment dir so the re-run is clean
    for d in exp_data/hp5ctrl exp_data/hp5lr exp_data/hp5feat exp_data/hp5corr; do
        [ -d "$d" ] && [ ! -d "$d/results" ] && { echo "rm partial $d"; rm -rf "$d"; }
    done
else
    echo "=== chain already exited $(date -u +%FT%TZ)"
fi

# ------------------------------------------------------------- priority 1
run_step headline_icp 7200 python run_test.py exp_name=prod40 $VAL2K \
    eval.ckpt=$BEST $ICPV2
HEADLINE_ICP=$(newest_since headline_icp "$PAIR_GLOB") || exit 1
run_step headline_ci 600 bash -c "set -o pipefail; python scripts/bootstrap_ci.py '$OLD_HEADLINE' '$HEADLINE_ICP' | tee /tmp/headline_icp_ci.txt"
echo "HEADLINE_ICP=$HEADLINE_ICP"

# ------------------------------------------------------------- priority 2
run_step stack240 3600 python run_test.py exp_name=prod40 $VAL \
    eval.ckpt=$BEST $ICPV2 test.dist_th=0.15
STACK240=$(newest_since stack240 "$PAIR_GLOB") || exit 1
echo "STACK240=$STACK240"

# ------------------------------------------------------------- priority 3
# train-time hparam ladder, 8-epoch controlled runs (VERDICT r4 #4).
# freq_valid=100 skips in-trainer valid; freq_save=4 saves epochs 3 and 7;
# the post-hoc sweep pins icp_refine=false (comparability with prod40).
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
        exp_name=$name $VAL test.icp_refine=false
    SW=$(newest_since sweep_$name "exp_data/$name/results/ckpt_sweep_*.json") || exit 1
    echo "HP_SWEEP $name = $SW  (overrides: '$ov')"
done

echo "=== FINAL_R5 SUMMARY $(date -u +%FT%TZ) ==="
echo "headline_icp(2000): $HEADLINE_ICP  ci=/tmp/headline_icp_ci.txt"
echo "stack240(icpv2+dist_th=0.15): $STACK240"
echo "hparams: exp_data/hp5*/results/ckpt_sweep_*.json vs hp5ctrl"
echo "=== done ==="
