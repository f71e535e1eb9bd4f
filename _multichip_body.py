"""Standalone body of the multi-chip dryrun (driver contract).

Run as ``python _multichip_body.py <n_devices>`` in a FRESH interpreter with
``JAX_PLATFORMS=cpu`` and ``--xla_force_host_platform_device_count=<n>`` —
``__graft_entry__.dryrun_multichip`` spawns exactly that.  A fresh process is
required for the same reason as ``tests/_dp_tp_body.py``: the dp/tp program's
GSPMD collectives (all-to-all over 'model'-axis groups + collective-permute)
need every virtual-device thread of XLA:CPU's in-process communicator at a
rendezvous concurrently, and the platform/env setup must happen before jax
initializes a backend.  On real multi-chip TPU the same program's collectives
ride ICI.

Reference parallelism being modeled: single-node DDP (reference
run_train.py:60-76) -> here a 2D dp x tp Mesh with GSPMD-sharded params.

Model scale: deliberately `tiny_oryon` at 28x28.  Measured round 4: tiny
takes ~3.5 min on the 1-core host (XLA:CPU compile dominates); `small`
would multiply that past the driver's patience, and EXECUTING a big model
on 8 virtual single-core devices proves nothing extra about sharding.
Production-scale evidence lives in tests/test_tp_fullscale.py: full-tree
TP spec coverage (name-drift guard) + AOT lowering of the production-shape
train step on the same 4x2 mesh, and tests/_cli_multichip_body.py runs the
CLI end-to-end at model.size=small on 8 devices.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 8

# Force the CPU platform + virtual device count regardless of what the outer
# environment (axon sitecustomize) injected.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags +
              f" --xla_force_host_platform_device_count={n_devices}").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 1-core hosts reach the collective rendezvous slowly; the default 40 s
    # termination timeout would abort the interpreter (see tests/conftest.py).
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402


def main() -> None:
    from oryon_tpu.data.synthetic import synthetic_pair_batch
    from oryon_tpu.models.oryon import tiny_oryon
    from oryon_tpu.parallel import make_mesh, replicate, shard_batch
    from oryon_tpu.parallel.tp import shard_params_tp
    from oryon_tpu.train import create_train_state, train_step

    avail = len(jax.devices())
    assert avail >= n_devices, (
        f"virtual CPU mesh has {avail} devices, need {n_devices}")

    # 2D mesh when possible: data-parallel batch axis + tensor-parallel
    # 'model' axis sharding the transformer MLP/attention weights (GSPMD
    # inserts the ICI collectives).
    n_model = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    n_data = n_devices // n_model

    model = tiny_oryon()
    batch = synthetic_pair_batch(seed=0, batch=n_data, img_hw=(28, 28),
                                 n_corrs=32, n_prompts=2, context_len=16,
                                 vocab=600)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               lr=3e-4, total_steps=10)
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[:n_devices])
    dbatch = batch._replace(cls_id=None, instance_id=None, id_a=None, id_q=None)
    sbatch = shard_batch(dbatch, mesh)
    sstate = replicate(state, mesh)
    if n_model > 1:
        sstate = sstate.replace(params=shard_params_tp(state.params, mesh))
    new_state, metrics = jax.jit(train_step)(sstate, sbatch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_state.params)
    total = float(metrics["loss/total"])
    assert np.isfinite(total), f"non-finite loss in multichip dryrun: {total}"
    print(f"MULTICHIP_OK n_devices={n_devices} mesh=({n_data}x{n_model}) "
          f"loss={total:.6f}")


if __name__ == "__main__":
    main()
