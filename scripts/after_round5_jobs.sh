#!/bin/bash
# Follow-up to round5_jobs.sh: once the chain finishes, re-measure the
# HEADLINE numbers with the icp_refine win applied (240-pair A/B:
# AR 0.8811 -> 0.9392 default knobs, -> 0.9486 with icp_points=1024
# icp_trim=0.6, /tmp/icp_ci{,2}.txt; the v2 knobs also win the direct
# on-vs-v2 bootstrap on VSD/MSPD/ADD(S)/R/T) and stack the best
# eval-time knob.
#
# Launch detached:
#   setsid nohup bash scripts/after_round5_jobs.sh >> /tmp/after_r5.log 2>&1 \
#       < /dev/null & echo $! > /tmp/after_r5.pid
set -u
cd "$(dirname "$0")/.."
source scripts/detached_lib.sh

EXP=exp_data/prod40
RDIR=$EXP/results
PAIR_GLOB="$RDIR/shapenet6d_val_*.json"
VAL2K="dataset.root=data_synth2k dataset.test.name=shapenet6d dataset.test.split=val"
VAL="dataset.root=data_synth dataset.test.name=shapenet6d dataset.test.split=val"
BEST=29
OLD_HEADLINE=$RDIR/shapenet6d_val_all_20082026_0717.json  # r4, icp off

echo "=== after_round5_jobs $(date -u +%FT%TZ): waiting for the chain"
while ! grep -q "=== done ===\|ABORTING JOB" /tmp/round5_jobs.log 2>/dev/null; do
    sleep 120
done
echo "=== chain finished $(date -u +%FT%TZ)"

# 1. new 2000-pair headline: serving defaults + icp_refine (v2 knobs —
# the measured best: icp_points=1024, icp_trim=0.6)
run_step headline_icp 7200 python run_test.py exp_name=prod40 $VAL2K \
    eval.ckpt=$BEST test.icp_refine=true test.icp_points=1024 test.icp_trim=0.6
HEADLINE_ICP=$(newest_since headline_icp "$PAIR_GLOB") || exit 1
run_step headline_ci 600 bash -c "set -o pipefail; python scripts/bootstrap_ci.py '$OLD_HEADLINE' '$HEADLINE_ICP' | tee /tmp/headline_icp_ci.txt"

# 2. stacked knobs on the 240-pair val: icp v2 + dist_th=0.15 (hp-grid best)
run_step stack240 3600 python run_test.py exp_name=prod40 $VAL \
    eval.ckpt=$BEST test.icp_refine=true test.icp_points=1024 \
    test.icp_trim=0.6 test.dist_th=0.15
STACK240=$(newest_since stack240 "$PAIR_GLOB") || exit 1

echo "=== AFTER_R5 SUMMARY $(date -u +%FT%TZ) ==="
echo "headline_icp(2000): $HEADLINE_ICP  ci=/tmp/headline_icp_ci.txt"
echo "stack240(icp+dist_th=0.15): $STACK240"
echo "=== done ==="
