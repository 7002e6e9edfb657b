"""Aggregate a jax.profiler chrome trace: top TPU ops by total duration.

Usage: python tools/profiles/trace_top.py /tmp/r2_trace [n_top]
Groups XLA op instances (sort.1, fusion.23, ...) by their base name and
prints total/avg ms, so the step breakdown (sorts vs pallas kernels vs
glue fusions) is read straight off the device track.
"""
import collections
import glob
import gzip
import json
import re
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2_trace"
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace under {root}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: process_name metadata containing 'TPU' and not 'host'
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_name.items()
                if "TPU" in nm.upper() or "/device" in nm}
    tot = collections.Counter()
    cnt = collections.Counter()
    steps = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        base = re.sub(r"[.\d]+$", "", name)
        dur = e.get("dur", 0) / 1e3  # ms
        tot[base] += dur
        cnt[base] += 1
    grand = sum(tot.values())
    print(f"# device tracks: {[pid_name[p] for p in dev_pids]}")
    print(f"# total device op time: {grand:.1f} ms (all iterations)")
    for name, ms in tot.most_common(n_top):
        print(f"{ms:9.2f} ms  x{cnt[name]:<4d} {name}")


if __name__ == "__main__":
    main()
