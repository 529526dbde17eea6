"""Adjudicate a paired-repetition drift run (ab_drift.py output):
per-query medians per side, B/A ratio, noise/real label.

Label rule (the r6 protocol): a delta is REAL only if the paired
medians disagree by more than 10% — interleaved fresh-process reps
cancel ambient load, so a uniform single-shot regression that
disappears under pairing was rig noise.

    python scripts/adjudicate_drift.py results.jsonl A_PATH B_PATH OUT.json \
        "A label" "B label" "context note"
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def main() -> int:
    jsonl, a_path, b_path, out_path, a_label, b_label, note = sys.argv[1:8]
    # Normalize before bucketing: the JSONL rows record whatever path
    # shape ab_drift.py was invoked with (relative, trailing slash, ...)
    # which need not equal this invocation's argv byte-for-byte.
    a_path, b_path = os.path.realpath(a_path), os.path.realpath(b_path)
    rows = [json.loads(line) for line in open(jsonl) if line.strip()]
    if not rows:
        raise SystemExit(f"{jsonl} is empty — nothing to adjudicate")
    sides = {a_path: [], b_path: []}
    unmatched = set()
    for r in rows:
        key = os.path.realpath(r["repo"])
        if key in sides:
            sides[key].append(r)
        else:
            unmatched.add(r["repo"])
    if unmatched or not sides[a_path] or not sides[b_path]:
        raise SystemExit(
            f"repo values in {jsonl} don't match the CLI sides:\n"
            f"  unmatched rows: {sorted(unmatched)}\n"
            f"  A={a_path}: {len(sides[a_path])} rows, "
            f"B={b_path}: {len(sides[b_path])} rows"
        )

    queries = sorted(rows[0]["queries"])
    verdicts = {}
    for qn in queries:
        med_a = statistics.median(r["queries"][qn] for r in sides[a_path])
        med_b = statistics.median(r["queries"][qn] for r in sides[b_path])
        ratio = med_b / med_a
        verdicts[qn] = {
            "median_A_sec": round(med_a, 3),
            "median_B_sec": round(med_b, 3),
            "ratio_B_over_A": round(ratio, 3),
            "verdict": "real" if abs(ratio - 1) > 0.10 else "noise",
        }

    out = {
        "protocol": (
            f"{len(sides[a_path])}+{len(sides[b_path])} interleaved reps, fresh "
            "process each, warmup + min-of-2 per query, sf1 (.localdata/sf1); "
            "paired medians, REAL iff |ratio-1| > 10%"
        ),
        "sides": {"A": a_label, "B": b_label},
        "context": note,
        "paired_reps": rows,
        "verdicts": verdicts,
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out, indent=1) + "\n")
    print(json.dumps({q: v["verdict"] for q, v in verdicts.items()}))
    print(json.dumps({q: v["ratio_B_over_A"] for q, v in verdicts.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
