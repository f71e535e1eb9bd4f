"""Standalone body of the CLI-level multi-device tests (VERDICT r2 next #6).

Run as ``python -m tests._cli_multichip_body <tmpdir>`` in a FRESH
interpreter (fresh-subprocess isolation like tests/_dp_tp_body.py: a warm
pytest process saturates XLA:CPU's in-process collective rendezvous).

Proves the ENTRY POINTS themselves — not just the jitted functions they
call — wire the mesh correctly (reference run_train.py:60-76 DDP entry
semantics):

1. ``run_test.py`` on an 8-virtual-device data mesh produces metrics JSON
   and a predictions CSV identical to its own single-device run.
2. ``run_train.py`` trains epoch 0 on ONE device, checkpoints, then resumes
   epoch 1 on an 8-way data mesh from that 1-device checkpoint — loss
   finite, second checkpoint written.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402


def _nocs_args(root):
    return [
        f"dataset.root={os.path.dirname(root)}",
        f"dataset.test.name={os.path.basename(root)}",
        "dataset.test.split=test_split",
        "model.size=small",
        "compute_vsd=false",
        "dataset.img_size=[56,56]",
        "test.solver=ransac",
        "use_seed=true", "seed=3",
    ]


def _run_eval(root, tmp, name, mesh_args):
    import run_test

    run_test.main(_nocs_args(root) + [
        "dataset.batch_size=8",
        f"exp_root={tmp}", f"exp_name={name}"] + mesh_args)
    rdir = os.path.join(tmp, name, "results")
    csv = [f for f in os.listdir(rdir) if f.endswith(".csv")][0]
    js = [f for f in os.listdir(rdir) if f.endswith(".json")][0]
    return (open(os.path.join(rdir, csv)).read(),
            json.load(open(os.path.join(rdir, js))))


def main() -> None:
    from tests._fixtures import make_nocs_tree

    tmp = sys.argv[1]
    assert len(jax.devices()) == 8, jax.devices()

    # 8 views / 8 pairs so batch_size=8 fills one sharded batch
    scenes = [(1, i) for i in range(4)] + [(2, i) for i in range(4)]
    pairs = [((1, 0), (1, 1)), ((1, 0), (1, 2)), ((1, 1), (1, 3)),
             ((1, 2), (2, 0)), ((2, 0), (2, 1)), ((2, 1), (2, 2)),
             ((2, 2), (2, 3)), ((1, 3), (2, 3))]
    root = os.path.join(tmp, "nocs8")
    os.makedirs(root, exist_ok=True)
    make_nocs_tree(root, scenes=scenes, pairs=pairs)

    # --- 1) run_test.py: 8-device data mesh == single-device, bit-for-bit
    csv_1, json_1 = _run_eval(root, tmp, "ev1", ["mesh.data=1"])
    csv_8, json_8 = _run_eval(root, tmp, "ev8", ["mesh.data=8"])
    assert csv_8 == csv_1, "sharded CSV differs from single-device"
    assert json_8 == json_1, "sharded metrics JSON differs"
    assert len(csv_8.strip().split("\n")) == 8
    print("eval: 8-device mesh == single-device (CSV + metrics JSON)")

    # --- 2) run_train.py: epoch 0 single-device -> resume epoch 1 on the
    # 8-way mesh from the 1-device checkpoint
    import run_train

    train_args = [
        f"dataset.root={os.path.dirname(root)}",
        f"dataset.train.name={os.path.basename(root)}",
        "dataset.train.split=test_split",
        "dataset.test.name=missing",      # skip validation for speed
        "model.size=small",
        "dataset.batch_size=8",
        "dataset.img_size=[56,56]",
        "training.freq_save=1", "training.freq_valid=99",
        f"exp_root={tmp}", "exp_name=tr",
    ]
    run_train.main(train_args + ["training.n_epochs=1", "mesh.data=1"])
    models = os.listdir(os.path.join(tmp, "tr", "models"))
    assert any("epoch=0000" in m for m in models), models

    run_train.main(train_args + ["training.n_epochs=2", "mesh.data=8",
                                 "resume_ckpt=last"])
    models = os.listdir(os.path.join(tmp, "tr", "models"))
    assert any("epoch=0001" in m for m in models), models

    # the resumed DP epoch logged finite losses
    logs = os.path.join(tmp, "tr", "logs")
    jl = [f for f in os.listdir(logs) if f.endswith(".jsonl")][0]
    rows = [json.loads(l) for l in open(os.path.join(logs, jl))
            if l.strip()]
    train_rows = [r for r in rows if "train_loss/total" in r]
    assert train_rows, rows[:3]
    assert all(np.isfinite(r["train_loss/total"]) for r in train_rows)
    print("train: 1-device epoch -> 8-way DP resume OK "
          f"({len(train_rows)} logged steps, losses finite)")
    print("CLI_MULTICHIP_OK")


if __name__ == "__main__":
    main()
