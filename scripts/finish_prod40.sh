#!/bin/bash
# Turnkey post-training analysis for the prod40 40-epoch run — the
# BASELINE.md "Round-4: prod40" completion checklist as one detached job:
#
#   1. wait for training to finish (checkpoint epoch=0039 = printed epoch 40)
#   2. per-checkpoint val sweep (240 pairs) -> best epoch by AR
#   3. full 2000-pair eval on the best epoch (serving defaults, int8 tower)
#   4. stage-isolation ladder on the best epoch (bf16, same protocol as the
#      round-4 prod3 ladder: debug_valid GT-corrs / oracle masks / predicted)
#   5. fused-MHA int8-logit A/B (attn_impl fused vs fused_i8qk) + paired
#      bootstrap CI on the per-pair JSONs
#
# Launch detached (survives session restarts, CLAUDE.md long-run pattern):
#   setsid nohup bash scripts/finish_prod40.sh >> /tmp/finish_prod40.log 2>&1 \
#       < /dev/null & echo $! > /tmp/finish_prod40.pid
#
# Results land in exp_data/prod40/results/; this log ends with a
# FINISH_PROD40 SUMMARY block to transcribe into BASELINE.md.
set -u
cd "$(dirname "$0")/.."
source scripts/detached_lib.sh
EXP=exp_data/prod40
RDIR=$EXP/results
VAL="dataset.root=data_synth dataset.test.name=shapenet6d dataset.test.split=val"
VAL2K="dataset.root=data_synth2k dataset.test.name=shapenet6d dataset.test.split=val"

echo "=== finish_prod40 $(date -u +%FT%TZ) ==="

# --- 1. wait for epoch 40 (idx 0039); trainer may re-exec, so poll the
# checkpoint tree + the absence of ANY run_train process, not one pid.
while true; do
    if [ -d "$EXP/models/epoch=0039" ]; then
        # final checkpoint exists; give the trainer a minute to wind down
        if ! ps -eo cmd | grep -q "[r]un_train.py exp_name=prod40"; then
            break
        fi
    fi
    sleep 120
done
echo "=== training complete $(date -u +%FT%TZ); checkpoints:"
ls "$EXP/models/"

PAIR_GLOB="$RDIR/shapenet6d_val_*.json"  # per-pair metrics JSONs

# --- 2. checkpoint sweep (serving defaults: int8 tower, pointdsc solver)
run_step sweep 7200 python scripts/sweep_checkpoints.py exp_name=prod40 $VAL
SWEEP_JSON=$(newest_since sweep "$RDIR/ckpt_sweep_*.json") || exit 1
BEST=$(python -c "import json,sys; print(json.load(open('$SWEEP_JSON'))['best_epoch'])")
echo "BEST_EPOCH=$BEST (from $SWEEP_JSON)"

# --- 3. full 2000-pair eval on the best epoch (headline row)
run_step headline 7200 python run_test.py exp_name=prod40 $VAL2K eval.ckpt=$BEST
HEADLINE_JSON=$(newest_since headline "$PAIR_GLOB") || exit 1
echo "HEADLINE_JSON=$HEADLINE_JSON"

# --- 4. ladder on the best epoch (bf16 strict parity, 240-pair val,
# identical protocol to the BASELINE.md round-4 prod3 ladder)
run_step ladder_gt 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    model.quant=none debug_valid=true
LADDER_GT=$(newest_since ladder_gt "$PAIR_GLOB") || exit 1
run_step ladder_oracle 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    model.quant=none test.mask=oracle
LADDER_ORACLE=$(newest_since ladder_oracle "$PAIR_GLOB") || exit 1
run_step ladder_pred 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    model.quant=none
LADDER_PRED=$(newest_since ladder_pred "$PAIR_GLOB") || exit 1
# --- 5. fused-MHA int8-logit A/B under serving defaults (int8 tower),
# 240-pair val, paired bootstrap CI
run_step ab_fused 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    model.attn_impl=fused
AB_FUSED=$(newest_since ab_fused "$PAIR_GLOB") || exit 1
run_step ab_i8qk 3600 python run_test.py exp_name=prod40 $VAL eval.ckpt=$BEST \
    model.attn_impl=fused_i8qk
AB_I8QK=$(newest_since ab_i8qk "$PAIR_GLOB") || exit 1
run_step ci 600 bash -c "set -o pipefail; python scripts/bootstrap_ci.py '$AB_FUSED' '$AB_I8QK' | tee /tmp/i8qk_ci.txt"

echo "=== FINISH_PROD40 SUMMARY $(date -u +%FT%TZ) ==="
echo "sweep: $SWEEP_JSON (best epoch $BEST)"
echo "headline 2000-pair: $HEADLINE_JSON"
echo "ladder: gt=$LADDER_GT oracle=$LADDER_ORACLE pred=$LADDER_PRED"
echo "i8qk A/B: fused=$AB_FUSED i8qk=$AB_I8QK ci=/tmp/i8qk_ci.txt"
echo "=== done ==="
