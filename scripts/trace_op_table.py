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
(fn.lower(...).compile().as_text() produces the file).
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

    top = collections.Counter()
    cnt = collections.Counter()
    tot = 0
    for name, dur in load_events(trace_dir):
        top[name] += dur
        cnt[name] += 1
        if not name.startswith("while"):
            tot += dur

    def opname(n):
        if hlo is None:
            return ""
        m = re.search(r"%" + re.escape(n) + r" = [^\n]*?op_name=\"([^\"]*)\"",
                      hlo)
        return ("  " + m.group(1)[-70:]) if m else ""

    print(f"total device op time (excl. while wrappers): "
          f"{tot / (1000 * iters):.2f} ms/iter")
    for name, dur in top.most_common(top_n):
        print(f"{dur / (1000 * iters):9.3f} ms  x{cnt[name] // iters:<5} "
              f"{name[:42]:42}{opname(name)}")


if __name__ == "__main__":
    main()
