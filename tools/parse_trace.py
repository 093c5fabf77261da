"""Aggregate device-lane op durations from a jax.profiler Chrome trace.

Usage: python tools/parse_trace.py <trace.json.gz> [n_steps] [hlo.txt]
Pairs with tools/profile_step.py (writes the trace to /tmp/jax_trace).
With an HLO dump (tools/dump_hlo.py), opaque ``fusion.NN`` names are
annotated with the fused computation's root op + shape.
"""
import collections
import gzip
import json
import os
import re
import sys


def hlo_fusion_roots(hlo_path):
    """fusion name -> 'root_op shape' from a post-optimization HLO dump."""
    calls = {}        # fusion instr name -> called computation name
    roots = {}        # computation name -> ROOT line summary
    comp = None
    with open(hlo_path) as f:
        for line in f:
            m = re.match(r"%?([\w.\-]+) (?:\([^)]*\) )?-> .*{$", line.strip())
            if m:
                comp = m.group(1)
            cm = re.search(r"%([\w.\-]+) = [^=]*fusion\(.*calls=%([\w.\-]+)", line)
            if cm:
                calls[cm.group(1)] = cm.group(2)
            rm = re.search(r"ROOT %[\w.\-]+ = (\S+)\s+(\S+)\(", line)
            if rm and comp:
                roots[comp] = f"{rm.group(2)} {rm.group(1)}"
    return {f: roots.get(c, "?") for f, c in calls.items()}

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
annot = {}
if len(sys.argv) > 3 and os.path.exists(sys.argv[3]):
    annot = hlo_fusion_roots(sys.argv[3])
print(f"total device op time: {total/1e3:.1f} ms ({total/(n_steps*1e3):.1f} ms/step)")
for name, d in dur.most_common(30):
    extra = f"  [{annot[name]}]" if name in annot else ""
    print(f"{d/(n_steps*1e3):8.2f} ms/step  x{cnt[name]//n_steps:<3} {name[:90]}{extra}")
