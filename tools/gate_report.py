"""Collate convergence A/B runs into the adoption-gate decision table.

The perf workflow (BASELINE.md round-2 log) gates every default change on
paired convergence runs: candidate vs control, same seed, same mix, final
step-1000 Hungarian mIoU / type-mIoU, ~±0.05 run noise.  The TPU queue
(tools/tpu_experiment_queue.sh) leaves one JSONL per run in /tmp; this tool
turns them into the decision table so an unattended queue's verdict is one
command instead of hand-collating eight files.

    python tools/gate_report.py /tmp/conv_*.jsonl
    python tools/gate_report.py --pair i32_def_s3=k48_def_s3 \
        --pair i32_hard_s2=k48_hard_s2 /tmp/conv_*.jsonl

Pairing is by name fragment: ``--pair CAND=CTRL`` matches each fragment
against the file stems.  Without ``--pair`` it just prints per-run finals.
Pure host-side file parsing — no jax import, safe to run anywhere.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

NOISE = 0.05  # observed run-to-run band (BASELINE.md K-sweep / p-sweep rows)


def load_run(path):
    """Return (header_comment, {step: row}) for one convergence JSONL."""
    header, rows = "", {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                header = line.lstrip("# ")
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue  # truncated tail from a killed run
            rows[int(row["step"])] = row
    return header, rows


def stem(path):
    s = os.path.basename(path)
    for pre in ("conv_", "scene_conv_"):
        if s.startswith(pre):
            s = s[len(pre):]
    return s.rsplit(".", 1)[0]


def metric_keys(rows):
    """Metric columns present in the rows (abc: miou/type_miou; scene adds
    others) — anything numeric except step/timing."""
    keys = []
    for row in rows.values():
        for k, v in row.items():
            if k in ("step", "t_min", "t_sec") or not isinstance(
                    v, (int, float)):
                continue
            if k not in keys:
                keys.append(k)
    return keys


def final_row(rows):
    return rows[max(rows)] if rows else None


def fmt_run(name, header, rows):
    fin = final_row(rows)
    if fin is None:
        return f"{name:<18} EMPTY ({header})"
    keys = metric_keys(rows)
    vals = " ".join(f"{k}={fin.get(k, float('nan')):.4f}" for k in keys)
    return f"{name:<18} step={max(rows):<5} {vals}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--pair", action="append", default=[],
                    metavar="CAND=CTRL",
                    help="name fragments pairing a candidate run with its "
                         "same-seed control; repeatable")
    ap.add_argument("--noise", type=float, default=NOISE)
    args = ap.parse_args()

    runs = {}
    for path in args.files:
        if not os.path.exists(path):
            continue
        header, rows = load_run(path)
        runs[stem(path)] = (header, rows)

    if not runs:
        print("no runs found", file=sys.stderr)
        return 1

    print("== runs ==")
    for name in sorted(runs):
        print(fmt_run(name, *runs[name]))

    if not args.pair:
        return 0

    def find(fragment):
        hits = [n for n in runs if fragment in n]
        if len(hits) != 1:
            print(f"pair fragment {fragment!r} matched {hits} — need exactly "
                  f"one of {sorted(runs)}", file=sys.stderr)
            return None
        return hits[0]

    print("\n== gates ==  (PASS: candidate within --noise "
          f"{args.noise} of control on every metric at the final step)")
    verdicts = []
    for pair in args.pair:
        cand_frag, _, ctrl_frag = pair.partition("=")
        cand, ctrl = find(cand_frag), find(ctrl_frag)
        if cand is None or ctrl is None:
            verdicts.append(False)
            continue
        crow, krow = final_row(runs[cand][1]), final_row(runs[ctrl][1])
        if crow is None or krow is None:
            print(f"{cand} vs {ctrl}: missing data")
            verdicts.append(False)
            continue
        # Compare at the last step BOTH runs evaluated: eval cadences can
        # differ (abc 250-step grid vs scene runs, truncated tails), so
        # min(max, max) may be missing from one dict — fail closed on an
        # empty intersection instead of KeyError-ing.
        common = set(runs[cand][1]) & set(runs[ctrl][1])
        if not common:
            print(f"{cand} vs {ctrl}: no common eval step")
            verdicts.append(False)
            continue
        step = max(common)
        crow = runs[cand][1][step]
        krow = runs[ctrl][1][step]
        deltas, ok = [], True
        for k in metric_keys(runs[ctrl][1]):
            if k not in crow or k not in krow:
                continue
            d = crow[k] - krow[k]
            ok = ok and (d >= -args.noise)
            deltas.append(f"{k} {crow[k]:.3f} vs {krow[k]:.3f} (d={d:+.3f})")
        print(f"{'PASS' if ok else 'FAIL'}  {cand} vs {ctrl} @step {step}: "
              + "; ".join(deltas))
        verdicts.append(ok)

    print("\nall gates pass" if all(verdicts) else "\nGATE FAILED")
    return 0 if all(verdicts) else 2


if __name__ == "__main__":
    sys.exit(main())
