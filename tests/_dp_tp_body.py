"""Standalone body of the dp/tp-mesh train-step test.

Run as ``python -m tests._dp_tp_body`` in a FRESH interpreter.  The dp/tp
program's GSPMD collectives (all-to-all over the 'model'-axis groups +
collective-permute over all 8 virtual devices) require every device thread of
XLA:CPU's in-process communicator to reach a rendezvous concurrently; in a
pytest process warmed by ~60 earlier tests, the executor pool is saturated
and the rendezvous deadlocks past any timeout (the same program completes in
seconds in a fresh process — and on real multi-chip TPU the collectives ride
ICI, not this in-process CPU path).  Hence subprocess isolation.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same platform setup as tests/conftest.py (fresh interpreter has none of it)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.tree_util as jtu  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from oryon_tpu.data.synthetic import synthetic_pair_batch
    from oryon_tpu.models.oryon import tiny_oryon
    from oryon_tpu.parallel import make_mesh, shard_batch
    from oryon_tpu.parallel.tp import shard_params_tp, tp_spec
    from oryon_tpu.train import create_train_state, train_step

    model = tiny_oryon()
    batch = synthetic_pair_batch(seed=2, batch=4, img_hw=(28, 28), n_corrs=32,
                                 n_prompts=2, context_len=16, vocab=600)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               lr=3e-4, total_steps=50)
    dbatch = batch._replace(cls_id=None, instance_id=None, id_a=None, id_q=None)

    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}, mesh.shape
    sparams = shard_params_tp(state.params, mesh)
    specs = [tp_spec(p, l) for p, l in jtu.tree_flatten_with_path(state.params)[0]]
    assert any("model" in str(s) for s in specs), "no leaf sharded over 'model'"
    sstate = state.replace(params=sparams)
    sbatch = shard_batch(dbatch, mesh)
    _, metrics = jax.jit(train_step)(sstate, sbatch, jax.random.PRNGKey(0))
    sharded = float(metrics["loss/total"])
    assert np.isfinite(sharded), sharded
    _, metrics_ref = jax.jit(train_step)(state, dbatch, jax.random.PRNGKey(0))
    ref = float(metrics_ref["loss/total"])
    assert abs(sharded - ref) <= 1e-3 * abs(ref), (sharded, ref)
    print(f"dp_tp OK: sharded={sharded:.6f} ref={ref:.6f}")


if __name__ == "__main__":
    main()
