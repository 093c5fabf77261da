"""Aggregate device-lane op durations from a jax.profiler Chrome trace.

Usage: python tools/parse_trace.py /tmp/jax_trace/plugins/profile/<ts>/vm.trace.json.gz [n_steps]
Pairs with tools/profile_step.py (writes the trace to /tmp/jax_trace).
"""
import collections
import gzip
import json
import sys

path = sys.argv[1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
with gzip.open(path) as f:
    data = json.load(f)
events = data["traceEvents"]
pids, tids = {}, {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
dur = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    if "TPU" not in pids.get(e.get("pid"), ""):
        continue
    if "XLA Ops" not in tids.get((e.get("pid"), e.get("tid")), ""):
        continue
    dur[e["name"]] += e["dur"]
    cnt[e["name"]] += 1
    total += e["dur"]
print(f"total device op time: {total/1e3:.1f} ms ({total/(n_steps*1e3):.1f} ms/step)")
for name, d in dur.most_common(30):
    print(f"{d/(n_steps*1e3):8.2f} ms/step  x{cnt[name]//n_steps:<3} {name[:90]}")
