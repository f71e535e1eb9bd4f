"""A/B profile of the Swin guidance tower attention/layout variants on TPU.

Times the full guidance tower (16 images at 384x384, the B=8-pair production
shape) for each {attn_impl} x {stage_pad} combination:

    einsum         — XLA path: per-block pad/roll/HBM window partition
    einsum+pad     — stage-level padding (one pad/crop per stage)
    pallas         — packed block-diagonal window kernel (HBM partition kept)
    band           — fused map-level kernel (window extraction in VMEM)
    band+pad       — band kernel + stage-level padding
    noattn         — attention stubbed out (layout floor)

Each variant is its own jitted program; timing barrier is a scalar host copy
(CLAUDE.md: block_until_ready does not force execution on this backend).
Optionally dumps a jax.profiler trace per variant (--trace DIR) for
scripts/trace_op_table.py, since wall-clock on the shared pool is noisy.

Usage: python scripts/profile_swin.py [--iters 30] [--trace /tmp/swintrace]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = [
    ("einsum", dict(attn_impl="einsum", stage_pad=False)),
    ("einsum+pad", dict(attn_impl="einsum", stage_pad=True)),
    ("pallas", dict(attn_impl="pallas", stage_pad=False)),
    ("band", dict(attn_impl="band", stage_pad=False)),
    ("band+pad", dict(attn_impl="band", stage_pad=True)),
    ("noattn", dict(attn_impl="noattn", stage_pad=False)),
]


def main() -> None:
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse

    import jax
    import jax.numpy as jnp
    from oryon_tpu.models.swin import SwinConfig, SwinGuidance

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--imgs", type=int, default=16)
    ap.add_argument("--trace", type=str, default=None,
                    help="dump a jax.profiler trace per variant under DIR/<name>")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.imgs, 384, 384, 3).astype(np.float32))

    ref_m = SwinGuidance(SwinConfig())
    ref_p = ref_m.init(jax.random.PRNGKey(0), x[:1])

    results = {}
    outs = {}
    for name, kw in VARIANTS:
        m = SwinGuidance(SwinConfig(**kw))

        def fwd(p, v, _m=m):
            g = _m.apply(p, v)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in g)

        jfwd = jax.jit(fwd)
        # warmup/compile + numeric cross-check vs the einsum reference
        s = float(np.asarray(jfwd(ref_p, x)))
        outs[name] = s
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfwd(ref_p, x)
        _ = float(np.asarray(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results[name] = round(ms, 2)
        print(f"{name:12s} {ms:7.2f} ms  (checksum {s:.1f})", flush=True)

        if args.trace:
            d = os.path.join(args.trace, name.replace("+", "_"))
            os.makedirs(d, exist_ok=True)
            jax.profiler.start_trace(d)
            for _ in range(5):
                out = jfwd(ref_p, x)
            _ = float(np.asarray(out))
            jax.profiler.stop_trace()

    ref = outs["einsum"]
    for name, s in outs.items():
        if name != "noattn" and abs(s - ref) > 1e-2 * max(1.0, abs(ref)):
            print(f"WARNING: {name} checksum {s} != einsum {ref}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
