"""Asset-day DRILL runner (docs/RUNBOOK.md drill log).

Executes the RUNBOOK's convert/place/verify path end-to-end with STAND-IN
assets so the real asset day is mechanical: random torch checkpoints in
the real download layouts (scripts/make_drill_assets.py), a synthetic
REAL275-format tree, the real converters, the real dataset-asset tools,
the real pair-split builder, and the real weight-merge loaders.  Each step
is timed; the summary block is transcribed into docs/RUNBOOK.md.

Usage: python scripts/run_asset_drill.py [work=/tmp/drill] [keep=1]
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIMES = []


def step(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            print(f"--- DRILL STEP: {name}", flush=True)
            out = fn(*a, **k)
            dt = time.time() - t0
            TIMES.append((name, dt))
            print(f"--- {name}: {dt:.1f}s", flush=True)
            return out
        return run
    return deco


def sh(*cmd):
    r = subprocess.run([sys.executable] + list(cmd), cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"drill step failed: {cmd} rc={r.returncode}")


@step("1. generate stand-in downloads (make_drill_assets)")
def gen_assets(work):
    sh("scripts/make_drill_assets.py", f"out={work}/downloads")


@step("2. convert checkpoints (convert_pretrained)")
def convert(work):
    sh("scripts/convert_pretrained.py",
       f"clip={work}/downloads/ViT-L-14-336px.pt",
       f"swin={work}/downloads/swin_b.pth",
       f"catseg={work}/downloads/catseg.pth",
       f"out={work}/pretrained_models")


@step("3. assemble a REAL275-format tree")
def make_tree(work):
    import numpy as np
    from tests._fixtures import make_nocs_tree
    # flat_depth makes same-scene views 3D-consistent (identical lifted
    # clouds under the shared per-scene pose) so the correspondence
    # builder has real matches to find
    scenes = [(s, i) for s in (1, 2, 3) for i in range(4)]
    pairs = [((1, 0), (2, 0)), ((1, 1), (3, 0)), ((2, 1), (3, 1)),
             ((1, 2), (2, 2))]
    make_nocs_tree(os.path.join(work, "data", "nocs"),
                   rs=np.random.RandomState(7), scenes=scenes, pairs=pairs,
                   flat_depth=800)


@step("4. rebuild auxiliary dataset assets (make_dataset_assets)")
def dataset_assets(work):
    root = f"root={work}/data/nocs"
    for tool in ("detections", "models_info", "normals"):
        sh("scripts/make_dataset_assets.py", tool, root)


@step("5. regenerate a pair split (make_pair_split)")
def pair_split(work):
    os.environ["ORYON_CPU"] = "1"  # keep the drill off a busy TPU
    sh("scripts/make_pair_split.py", f"dataset.root={work}/data",
       "dataset.test.name=nocs", "split_name=drill_split", "n_pairs=8",
       "pair_mode=same_scene", "min_corrs=50")
    lst = os.path.join(work, "data", "nocs", "fixed_split", "drill_split",
                       "instance_list.txt")
    n = sum(1 for _ in open(lst))
    if n == 0:
        raise SystemExit("pair split wrote 0 pairs — drill FAILED")
    print(f"  {n} pairs in {lst}")


@step("6. merge converted weights into the full model (load-path check)")
def load_check(work):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from oryon_tpu.config import load_config
    from oryon_tpu.models.oryon import build_model
    from oryon_tpu.models.pretrained import load_pretrained_params

    cfg = load_config(None, [
        f"pretrained.clip={work}/pretrained_models/clip_vit_l14_336.npz",
        f"pretrained.swin={work}/pretrained_models/swin_b.npz",
        f"pretrained.catseg={work}/pretrained_models/catseg.npz",
        f"pretrained.pointdsc={work}/downloads/pointdsc",
    ])
    model = build_model("full")
    rgb = jnp.zeros((1, 224, 224, 3), jnp.float32)
    ids = jnp.zeros((1, 1, 77), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), rgb, rgb, ids)
    params, report = load_pretrained_params(cfg, params)
    print("\n".join("  " + r for r in report))
    missing = [r for r in report if "missing" in r]
    if missing:
        raise SystemExit(f"loader fell back to random init: {missing}")

    # PointDSC: the snapshot must be preferred (and say so)
    from oryon_tpu.pipeline import build_pointdsc_solver
    _, _ = build_pointdsc_solver(cfg.pretrained.pointdsc,
                                 jax.random.PRNGKey(0), 500)


@step("7. converter/parity test gates (RUNBOOK step-1 postcheck)")
def test_gate(_work):
    r = subprocess.run([sys.executable, "-m", "pytest",
                        "tests/test_convert.py", "-q", "--no-header"],
                       cwd=REPO)
    if r.returncode != 0:
        raise SystemExit("tests/test_convert.py failed")


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    work = kv.get("work", "/tmp/drill")
    keep = kv.get("keep", "1") == "1"
    os.makedirs(work, exist_ok=True)

    gen_assets(work)
    convert(work)
    make_tree(work)
    dataset_assets(work)
    pair_split(work)
    load_check(work)
    test_gate(work)

    print("=== DRILL SUMMARY ===")
    for name, dt in TIMES:
        print(f"  {dt:8.1f}s  {name}")
    print(f"  total: {sum(t for _, t in TIMES):.1f}s")
    if not keep:
        shutil.rmtree(work)


if __name__ == "__main__":
    main(sys.argv[1:])
