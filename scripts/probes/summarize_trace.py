"""Summarize a jax.profiler trace: device time grouped by source location.

Usage: summarize_trace.py [trace_dir] [n_steps]
"""
import collections
import glob
import gzip
import json
import sys

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

path = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    data = json.load(f)

by_src = collections.Counter()
by_cat = collections.Counter()
examples = {}
total = 0.0
for e in data["traceEvents"]:
    if e.get("ph") != "X" or e.get("pid") != 3 or e.get("tid") != 3:
        continue
    d = e.get("dur", 0.0)
    total += d
    args = e.get("args", {})
    src = args.get("source", "?")
    cat = args.get("hlo_category", "?")
    by_src[src] += d
    by_cat[cat] += d
    if src not in examples or d > examples[src][0]:
        examples[src] = (d, e["name"], args.get("tf_op", "")[:80])

print(f"total device: {total / n_steps / 1000:.1f} ms/step\n")
print("== by hlo category ==")
for c, d in by_cat.most_common(15):
    print(f"{d / n_steps / 1000:9.2f} ms  {c}")
print("\n== by source ==")
for s, d in by_src.most_common(45):
    _, name, tf_op = examples[s]
    print(f"{d / n_steps / 1000:9.2f} ms  {s}  [{name[:40]} {tf_op[:60]}]")
