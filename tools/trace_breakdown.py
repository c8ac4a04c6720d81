r"""Parse a JAX profiler trace (trace.json.gz) into an op-class time breakdown.

Usage: python tools/trace_breakdown.py /tmp/admtrace [top_n]
"""

import collections
import glob
import gzip
import json
import re
import sys


def classify(name: str) -> str:
    n = name.lower()
    if n.startswith("jit_") or n.startswith("xla_"):
        return "wrapper(excluded)"
    if "convolution" in n:
        return "conv"
    if "dot" in n or "gemm" in n or "matmul" in n:
        return "matmul"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(elementwise/reduce)"
    if "reduce" in n:
        return "reduce"
    if "custom-call" in n or "pallas" in n or "tpu_custom_call" in n:
        return "pallas/custom"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/layout"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n:
        return "slice/concat/pad"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    paths = glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {root}"
    path = sorted(paths)[-1]

    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])

    # Keep only TPU-side op events (pid/tid heuristics: events with 'dur' and
    # args containing hlo info, on track names that look like an accelerator)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_names.items()
        if re.search(r"tpu|device|/device|xla", name, re.I) and "host" not in name.lower()
    }

    per_op = collections.Counter()
    per_class = collections.Counter()
    total = 0.0

    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if classify(name) == "wrapper(excluded)":
            continue
        args = e.get("args", {}) or {}
        # op-level events carry hlo metadata; skip step/trace wrappers
        if not device_pids and not ("hlo" in str(args).lower() or re.match(r"^(fusion|copy|convolution|dot|reduce|custom|loop|dynamic|pad|concatenate|transpose|bitcast|select|broadcast|iota|rng|scatter|gather|slice|add|multiply|subtract|divide|compare|convert|tanh|exp)", name)):
            continue
        dur = e["dur"]
        per_op[name] += dur
        per_class[classify(name)] += dur
        total += dur

    print(f"trace: {path}")
    print(f"pids: { {p: n for p, n in pid_names.items()} }")
    print(f"total device op time: {total/1e3:.2f} ms\n")

    print("== by class ==")
    for cls, dur in per_class.most_common():
        print(f"  {cls:28s} {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%")

    print(f"\n== top {top_n} ops ==")
    for name, dur in per_op.most_common(top_n):
        print(f"  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
