"""Summarize device-side op times from a jax.profiler trace.

The axon tunnel breaks wall-clock timing of sub-ms kernels (CLAUDE.md), but
`jax.profiler.start_trace` works through it and records true device-side op
durations.  This tool aggregates the Chrome-trace export by op category so
kernel-level A/Bs can be read off a single capture.

Usage:
  python tools/trace_summary.py /tmp/unet_trace_bs2c [--top 30] [--steps 5]

--steps divides total durations by the number of profiled iterations so the
printed numbers are per-call.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


def load_events(logdir: str):
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Keep only the "XLA Ops" lane of device processes: leaf op durations.
    # The "XLA Modules" lane holds the enclosing jit span (would double-count)
    # and host lanes hold python/runtime noise.
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n.upper() or "/device:" in n}
    if not dev_pids:  # CPU-only trace
        dev_pids = set(pids)
    op_lanes = {(e["pid"], e["tid"]) for e in events
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in dev_pids
                and e["args"].get("name") in ("XLA Ops", "Async XLA Ops")}
    return [e for e in events
            if e.get("ph") == "X" and e.get("dur")
            and (e.get("pid"), e.get("tid")) in op_lanes]


CATEGORIES = [
    ("flash_attn", r"flash|pallas"),
    ("conv", r"^%?(conv|cudnn)|convolution"),
    ("matmul", r"^%?(dot|gemm)|fusion.*dot"),
    ("fusion", r"^%?(loop_|input_|output_)?fusion"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("reduce", r"reduce"),
    ("all_reduce", r"all-reduce|all-gather|collective"),
    ("dynamic", r"dynamic-(update-)?slice"),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in CATEGORIES:
        if re.search(pat, low):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=1,
                    help="profiled iterations; durations are divided by this")
    ap.add_argument("--like", default=None,
                    help="only show ops whose name matches this regex")
    args = ap.parse_args()

    events = load_events(args.logdir)
    if args.like:
        pat = re.compile(args.like, re.I)
        events = [e for e in events if pat.search(e["name"])]

    by_name = collections.defaultdict(lambda: [0.0, 0])
    for e in events:
        rec = by_name[e["name"]]
        rec[0] += e["dur"]  # us
        rec[1] += 1

    total = sum(v[0] for v in by_name.values()) / args.steps
    print(f"device total: {total/1e3:.3f} ms/step "
          f"({len(by_name)} distinct ops, {args.steps} steps)\n")

    by_cat = collections.defaultdict(float)
    for name, (dur, _) in by_name.items():
        by_cat[categorize(name)] += dur / args.steps
    print("by category:")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:16s} {dur/1e3:8.3f} ms  {100*dur/max(total,1e-9):5.1f}%")

    print(f"\ntop {args.top} ops (per step):")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (dur, cnt) in rows:
        print(f"  {dur/args.steps/1e3:8.3f} ms  x{cnt//args.steps:<4d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
