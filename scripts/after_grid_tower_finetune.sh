#!/bin/bash
# Queue the train_towers control experiment behind the hparam grid: once
# /tmp/hp_grid.log prints its done marker, (1) probe that the unfrozen-tower
# train step now FITS on v5e with the block-remat path (it OOMed without it
# at B=32 — BASELINE.md round 4), stepping B down 32->16->8 until one fits,
# then (2) fine-tune from the prod40 best checkpoint with the towers
# unfrozen (model.train_towers=true, params warm-started via
# init_params_from, fresh AdamW + low lr), and (3) run the 240-pair val
# sweep on the fine-tuned checkpoints.
#
# The scientific question (VERDICT r3 weak #1): after the 40-epoch recipe,
# is the REMAINING AR headroom tower-bound?  If a few unfrozen epochs move
# recall(5deg,10cm)/AR, the ceiling was the random frozen towers; if flat,
# the fusion/decoder already extracts what random towers offer.
#
# Launch detached (CLAUDE.md long-run pattern):
#   setsid nohup bash scripts/after_grid_tower_finetune.sh \
#       >> /tmp/tower_ft.log 2>&1 < /dev/null & echo $! > /tmp/tower_ft.pid
set -u
cd "$(dirname "$0")/.."
FLOG=/tmp/finish_prod40.log
GLOG=/tmp/hp_grid.log
VAL="dataset.root=data_synth dataset.train.split=train dataset.test.name=shapenet6d dataset.test.split=val"

echo "=== after_grid_tower_finetune $(date -u +%FT%TZ): waiting for hp grid"
while ! grep -q "after_prod40_hparams done\|aborting" "$GLOG" 2>/dev/null; do
    sleep 120
done

BEST=$(grep -oP "BEST_EPOCH=\K[0-9]+" "$FLOG" | tail -1)
BEST=${BEST:-39}
echo "=== grid done; probing unfrozen-tower memory fit (best epoch $BEST)"

FIT=""
for B in 32 16 8; do
    echo "--- probe B=$B"
    if timeout 3600 python scripts/probe_train_towers.py $B; then
        FIT=$B
        break
    fi
    echo "--- B=$B failed (see above)"
done
if [ -z "$FIT" ]; then
    echo "=== no batch size fits even with remat; aborting fine-tune"
    exit 1
fi
echo "=== PROBE_FIT B=$FIT"

# fine-tune: 6 epochs, fresh cosine over those epochs, 10x lower lr (the
# towers are warm-started into a converged fusion/decoder; default lr
# destroys them), feature-loss recipe otherwise identical to prod40
timeout 28800 python run_train.py exp_name=prod40tt $VAL \
    model.train_towers=true init_params_from=prod40:$BEST \
    dataset.batch_size=$FIT optimization.lr=1e-4 training.n_epochs=6 \
    training.freq_valid=2 resume_ckpt=none

echo "=== fine-tune done; 240-pair val sweep over prod40tt checkpoints"
timeout 7200 python scripts/sweep_checkpoints.py exp_name=prod40tt \
    dataset.root=data_synth dataset.test.name=shapenet6d dataset.test.split=val
echo "=== TOWER_FT SUMMARY: compare exp_data/prod40tt/results/ckpt_sweep_* "
echo "    against the prod40 best row (tower-bound iff it moves)"
echo "=== after_grid_tower_finetune done $(date -u +%FT%TZ)"
