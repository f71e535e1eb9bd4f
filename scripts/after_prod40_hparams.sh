#!/bin/bash
# Queue the full eval-time hparam grid behind the prod40 finish job: wait
# for finish_prod40.sh to print its SUMMARY block, extract the best epoch,
# then run scripts/sweep_eval_hparams.py (default grid) on it.
#
# Launch detached (CLAUDE.md long-run pattern):
#   setsid nohup bash scripts/after_prod40_hparams.sh \
#       >> /tmp/hp_grid.log 2>&1 < /dev/null & echo $! > /tmp/hp_grid.pid
set -u
cd "$(dirname "$0")/.."
FLOG=/tmp/finish_prod40.log

echo "=== after_prod40_hparams $(date -u +%FT%TZ): waiting for finish job"
while ! grep -q "^=== done ===" "$FLOG" 2>/dev/null; do sleep 120; done

BEST=$(grep -oP "BEST_EPOCH=\K[0-9]+" "$FLOG" | tail -1)
if [ -z "$BEST" ]; then
    echo "no BEST_EPOCH in $FLOG; aborting" >&2
    exit 1
fi
echo "=== finish job done; sweeping hparam grid on epoch $BEST"
timeout 14400 python -u scripts/sweep_eval_hparams.py exp_name=prod40 \
    eval.ckpt=$BEST dataset.root=data_synth dataset.test.name=shapenet6d \
    dataset.test.split=val
echo "=== after_prod40_hparams done $(date -u +%FT%TZ)"
