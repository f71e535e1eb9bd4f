"""Per-op device-time table from a jax.profiler trace (the reliable way to
measure on this backend — wall clocks on the shared TPU pool vary several-
fold, device traces do not; see CLAUDE.md).

Usage:
    python scripts/trace_op_table.py /tmp/mytrace [--iters N] [--hlo file]

where /tmp/mytrace is a directory passed to jax.profiler.start_trace(...).
Prints total device op time per iteration and the top ops; `while` entries
are scan-loop totals whose per-layer body fusions also appear individually
(x24 etc.), so don't sum them. With --hlo <compiled-HLO-text-file> each
fusion is annotated with its source op_name metadata
(fn.lower(...).compile().as_text() produces the file) AND the run is
summarized per pipeline STAGE — attribution is structural (XLA's op_name
source metadata), not positional HLO names, so it survives an XLA version
bump that renumbers `fusion.N`/`while.N` (VERDICT r3 weak #6).
`bench.py --trace=DIR` writes the matching HLO to DIR/hlo.txt
automatically.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pipeline stages by op_name source metadata (flax module paths / jax name
# scopes of oryon_tpu/models + pipeline ops).  First match wins; order is
# most-specific-first.  These match MODULE NAMES in our source tree, which
# we control — unlike `fusion.N` trace names, which XLA controls.
STAGE_PATTERNS = [
    ("clip_tower", r"vlm_visual|VisionTower|vision_tower"),
    ("text_tower", r"vlm_text|text_tower"),
    ("swin_guidance", r"guidance|swin"),
    ("fusion", r"fusion|cost_volume|class_transformer"),
    ("decoder", r"decoder|upsampl"),
    ("matching", r"nn_correspond|matching|argmin|topk_mask"),
    ("lift", r"lift_pcd|pcd"),
    ("pointdsc", r"pointdsc|PointDSC|spectral"),
    ("ransac", r"ransac|kabsch|horn"),
]


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if "TPU" in n]
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e and e["pid"] in dev
                and not e["name"].startswith("jit")):
            yield e["name"], e["dur"]


def parse_op_names(hlo: str) -> dict:
    """HLO instruction name -> op_name source metadata, for every
    instruction that carries one ("%fusion.3 = ... op_name=\"...\")."""
    return dict(re.findall(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]*)\"", hlo))


def classify(op_name: str) -> str:
    for stage, pat in STAGE_PATTERNS:
        if re.search(pat, op_name, re.IGNORECASE):
            return stage
    return "other"


def stage_table(events, op_names: dict):
    """Group device time per pipeline stage via op_name metadata.

    `while` wrapper events are EXCLUDED from the sums — their body fusions
    appear as separate events already attributed to the right stage, so
    counting the wrapper too would double-book every scanned tower.
    """
    by_stage = collections.Counter()
    unattributed = collections.Counter()
    for name, dur in events:
        if name.startswith("while"):
            continue
        meta = op_names.get(name, "")
        stage = classify(meta) if meta else "other"
        by_stage[stage] += dur
        if not meta:
            unattributed[name] += dur
    return by_stage, unattributed


def main() -> None:
    args = sys.argv[1:]
    iters = 1
    hlo = None
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        del args[i:i + 2]
    if "--hlo" in args:
        i = args.index("--hlo")
        hlo = open(args[i + 1]).read()
        del args[i:i + 2]
    top_n = 30
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i:i + 2]
    trace_dir = args[0]
    # bench.py --trace drops the compiled HLO next to the trace; pick it up
    # automatically so the stage table needs no extra flag
    auto_hlo = os.path.join(trace_dir, "hlo.txt")
    if hlo is None and os.path.exists(auto_hlo):
        hlo = open(auto_hlo).read()

    events = list(load_events(trace_dir))
    top = collections.Counter()
    cnt = collections.Counter()
    tot = 0
    for name, dur in events:
        top[name] += dur
        cnt[name] += 1
        if not name.startswith("while"):
            tot += dur

    op_names = parse_op_names(hlo) if hlo else {}

    def opname(n):
        s = op_names.get(n, "")
        return ("  " + s[-70:]) if s else ""

    print(f"total device op time (excl. while wrappers): "
          f"{tot / (1000 * iters):.2f} ms/iter")
    for name, dur in top.most_common(top_n):
        print(f"{dur / (1000 * iters):9.3f} ms  x{cnt[name] // iters:<5} "
              f"{name[:42]:42}{opname(name)}")

    if op_names:
        by_stage, unattr = stage_table(events, op_names)
        total = sum(by_stage.values())
        print("\nper-stage device budget (op_name metadata attribution):")
        for stage, dur in by_stage.most_common():
            print(f"{dur / (1000 * iters):9.3f} ms  {dur / total:5.1%}  "
                  f"{stage}")
        if unattr:
            miss = sum(unattr.values())
            print(f"  ({miss / (1000 * iters):.3f} ms in {len(unattr)} ops "
                  f"without op_name metadata, counted under 'other')")


if __name__ == "__main__":
    main()
