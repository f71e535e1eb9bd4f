"""Device-mesh layout and sharding helpers.

The reference scales with single-node Lightning DDP + NCCL allreduce
(reference: run_train.py:60-76).  The TPU-native equivalent is a
`jax.sharding.Mesh` with a ``data`` axis over ICI: batches are sharded on
axis 0, parameters are replicated, and XLA inserts the gradient all-reduce
automatically when the jitted train step consumes sharded inputs with
replicated parameter shardings.  An optional ``model`` axis is reserved for
tensor-parallel experiments on the ViT encoder.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devs) // n_model
    use = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=("data", "model"))


def serving_mesh(n_data: int, n_model: int, batch_size: int,
                 label: str = "eval") -> Optional[Mesh]:
    """Mesh-selection policy shared by the eval/serving entry points
    (run_test.py, OryonPredictor.from_config): decide whether this process
    can shard request batches over a ``data`` axis, falling back to
    single-device with a WARNING instead of crashing when it can't.

    Fallback cases (all return None):
      * single-device host;
      * the configured mesh (data*model) needs more devices than the host
        has — e.g. a training config with mesh.data=8 served on a 4-chip
        host (previously an opaque numpy reshape ValueError in make_mesh);
      * batch_size not divisible by the data axis.

    Callers with ``n_model > 1`` still apply shard_params_tp themselves.
    """
    n_dev = len(jax.devices())
    if n_dev <= 1:
        return None
    n_model = max(1, n_model)
    eff_data = n_data if n_data != -1 else n_dev // n_model
    if eff_data < 1 or eff_data * n_model > n_dev:
        print(f"WARNING: mesh data={n_data} model={n_model} needs "
              f"{max(eff_data, 1) * n_model} devices but only {n_dev} "
              f"available; running single-device")
        return None
    mesh = make_mesh(n_data, n_model)
    if batch_size % mesh.shape["data"] != 0:
        print(f"WARNING: batch_size {batch_size} not divisible by data axis "
              f"{mesh.shape['data']}; running single-device")
        return None
    print(f"{label} mesh: data={mesh.shape['data']} "
          f"model={mesh.shape['model']}")
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array leaf of a pytree with axis-0 sharded over ``data``.

    Leaves that are not jax/numpy arrays (host-side id fields) pass through.
    """
    sh = batch_sharding(mesh)

    def place(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1 and not isinstance(x, (str, bytes)):
            try:
                return jax.device_put(x, sh)
            except (ValueError, TypeError):
                return x
        return x

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def place_params(params: Any, mesh: Mesh) -> Any:
    """Replicate parameters over ``mesh`` — EXCEPT leaves that already carry
    a sharding on this mesh (e.g. tensor-parallel shards from
    shard_params_tp), which keep it.  A blanket replicate() would silently
    all-gather TP shards onto every device."""
    repl = replicate_sharding(mesh)

    def _place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(_place, params)
