"""Training loop machinery: optimizer partition, schedules, jitted train step.

Rebuilds the reference orchestration (reference: pipeline.py:100-192,
run_train.py) TPU-first:
  * AdamW on the TRAINABLE subtree only (fusion + decoder — reference
    net.py:37-43) via optax.multi_transform; frozen towers get set_to_zero,
    so optimizer state for 300M frozen CLIP/Swin params is never allocated;
  * cosine LR decay to gamma*lr over the run (reference pipeline.py:132-136
    CosineAnnealingLR semantics), stepped per optimizer step;
  * one jitted train_step: forward + contrastive/mask loss + grad + update,
    donated state, batch sharded over the ``data`` mesh axis (gradient
    all-reduce inserted by XLA — the DDP replacement).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from oryon_tpu.data.pair_batch import PairBatch, device_fields
from oryon_tpu.losses.feature_loss import FeatureLossConfig, feature_loss
from oryon_tpu.models.oryon import OryonModel

TRAINABLE_PREFIXES = ("fusion", "decoder")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    model: OryonModel = struct.field(pytree_node=False)
    loss_cfg: FeatureLossConfig = struct.field(pytree_node=False)


def trainable_label(path: Tuple, _leaf: Any, train_towers: bool = False) -> str:
    """'train' for fusion/decoder subtrees, 'frozen' otherwise.

    ``train_towers`` (the oryon_tpu control extension, models/oryon.py
    OryonModel.train_towers) flips the vision towers to 'train' as well;
    the text tower stays 'frozen' — its output is stop-gradient'd
    regardless (prompt-embedding cache contract), so allocating AdamW
    state for it would be pure waste."""
    for p in path:
        key = getattr(p, "key", None)
        if key in TRAINABLE_PREFIXES:
            return "train"
        if train_towers and key in ("vlm_visual", "guidance"):
            return "train"
    return "frozen"


def cosine_lr(base_lr: float, total_steps: int, gamma: float) -> optax.Schedule:
    """Cosine from base_lr to gamma*base_lr over total_steps
    (reference CosineAnnealingLR with eta_min=gamma*lr, pipeline.py:132-136)."""
    floor = gamma * base_lr
    amp = base_lr - floor

    def sched(step):
        t = jnp.clip(step / jnp.maximum(total_steps - 1, 1), 0.0, 1.0)
        return floor + 0.5 * amp * (1.0 + jnp.cos(jnp.pi * t))

    return sched


def make_optimizer(
    params: Any,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    total_steps: int = 10000,
    gamma: float = 0.1,
    optim_type: str = "Adam",
    scheduler_type: str = "cosine",
    momentum: float = 0.0,
    train_towers: bool = False,
) -> optax.GradientTransformation:
    """Optimizer partition honoring the reference's optimization block
    (configs/config.yaml:64-70): optim_type Adam(W)/SGD, cosine or constant
    schedule, momentum for SGD."""
    if scheduler_type == "cosine":
        sched = cosine_lr(lr, total_steps, gamma)
    else:
        sched = lr
    if optim_type.lower() in ("adam", "adamw"):
        opt = optax.adamw(sched, weight_decay=weight_decay)
    elif optim_type.lower() == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(sched, momentum=momentum or None),
        )
    else:
        raise ValueError(f"optim_type {optim_type}")
    labels = jax.tree_util.tree_map_with_path(
        lambda p, x: trainable_label(p, x, train_towers), params)
    tx = optax.multi_transform(
        {"train": opt, "frozen": optax.set_to_zero()},
        labels,
    )
    return tx


def create_train_state(
    model: OryonModel,
    key: jax.Array,
    sample_batch: PairBatch,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    total_steps: int = 10000,
    gamma: float = 0.1,
    loss_cfg: FeatureLossConfig = FeatureLossConfig(),
    optim_type: str = "Adam",
    scheduler_type: str = "cosine",
    momentum: float = 0.0,
) -> TrainState:
    params = model.init(key, sample_batch.anchor.rgb, sample_batch.query.rgb,
                        sample_batch.prompt_ids)
    tx = make_optimizer(params, lr, weight_decay, total_steps, gamma,
                        optim_type, scheduler_type, momentum,
                        train_towers=getattr(model, "train_towers", False))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        model=model,
        loss_cfg=loss_cfg,
    )


def loss_and_metrics(model, loss_cfg, params, batch: PairBatch, key):
    # batch.text_emb (per-class prompt-embedding cache, pipeline.py
    # make_train_text_cache) skips the frozen text tower: identical numerics
    # (stop-gradient output), and the tower re-encoding 32x80 identical
    # prompt sequences was ~40% of the step (traced; BASELINE.md)
    out = model.apply(params, batch.anchor.rgb, batch.query.rgb,
                      batch.prompt_ids if batch.text_emb is None else None,
                      batch.text_emb)
    input_hw = tuple(batch.anchor.rgb.shape[1:3])
    lo = feature_loss(
        out.featmap_a, out.featmap_q, out.mask_a, out.mask_q,
        batch.anchor.mask, batch.query.mask,
        batch.corrs, batch.corr_valid, batch.valid,
        input_hw, key, loss_cfg,
    )
    metrics = {
        "loss/total": lo.total,
        "loss/mask": lo.losses["mask"],
        "loss/pos": lo.losses["pos"],
        "loss/neg": lo.losses["neg"],
        "metric/iou_a": jnp.mean(lo.iou_a),
        "metric/iou_q": jnp.mean(lo.iou_q),
    }
    return lo.total, metrics


def train_step(state: TrainState, batch: PairBatch, key: jax.Array,
               aug_cfg=None, accum_steps: int = 1):
    """One optimization step; jit with donate_argnums=(0,) at call sites.

    ``aug_cfg`` (static, a data.device_augment.DeviceAugConfig or None)
    applies the color/flip augmentation stack ON DEVICE before the forward —
    fused into this program, so it adds no launches and no host work (the
    1-core host is the measured training bottleneck; BASELINE.md round 2).

    ``accum_steps`` (static) > 1 enables GRADIENT ACCUMULATION: the [B,...]
    batch is split into ``accum_steps`` micro-batches of B/accum_steps and
    scanned with a running gradient sum, then ONE optimizer update applies
    the mean gradient.  Bitwise-equivalent objective (the feature/mask
    losses are per-sample means, so the mean of micro-batch grads equals
    the full-batch grad up to fp assoc), but activation memory scales with
    the MICRO batch — this is what fits the unfrozen-tower (train_towers)
    backward in v5e HBM at effective B=32 (the B=16 full step OOMed in the
    real trainer; BASELINE.md round 4).  The schedule/step count still
    advance once per optimizer step.
    """
    if aug_cfg is not None:
        from oryon_tpu.data.device_augment import device_augment
        batch = device_augment(batch, jax.random.fold_in(key, 0x0a), aug_cfg)

    def lf(p, b, k):
        return loss_and_metrics(state.model, state.loss_cfg, p, b, k)

    if accum_steps <= 1:
        (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params, batch, key)
    else:
        B = batch.corrs.shape[0]
        if B % accum_steps != 0:
            raise ValueError(
                f"batch size {B} not divisible by accum_steps {accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, B // accum_steps) + x.shape[1:]),
            batch)
        keys = jax.random.split(key, accum_steps)

        def one(b, k):
            return jax.value_and_grad(lf, has_aux=True)(state.params, b, k)

        # zero-init carry from abstract shapes — backward compiles ONCE
        shapes = jax.eval_shape(one, jax.tree.map(lambda x: x[0], micro),
                                keys[0])
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        def body(carry, inp):
            (_, msum), gsum = carry
            b, k = inp
            (lm, g) = one(b, k)
            return ((None, jax.tree.map(jnp.add, msum, lm[1])),
                    jax.tree.map(jnp.add, gsum, g)), None

        ((_, msum), gsum), _ = jax.lax.scan(
            body, ((None, zeros[0][1]), zeros[1]), (micro, keys))
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda x: x * inv, gsum)
        metrics = jax.tree.map(lambda x: x * inv, msum)

    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
    return new_state, metrics


def jit_train_step(donate: bool = True, aug_cfg=None, accum_steps: int = 1):
    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else (),
                     static_argnames=("aug_cfg", "accum_steps"))

    def run(state: TrainState, batch: PairBatch, key: jax.Array):
        return jitted(state, device_fields(batch), key, aug_cfg, accum_steps)

    return run
