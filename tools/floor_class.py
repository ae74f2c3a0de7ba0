#!/usr/bin/env python3
"""Mechanical sweep adjudication for FLOOR_CLASS.json (verdict r14 #4's
"going forward" rule): every row whose wall ratio exceeds 2x in the
canonical sweep gets an adjudication entry — here generated, not
hand-curated, so the sidecar stays the single mechanical source without
hand-writing ~100 sub-millisecond-oracle rows.

Inputs: bench_canonical.json (the kept sweep) and a bench_duck.py output
file (one-shot oracle walls at the same sf, same sitting class).
Disposition per >2x row:
  - "floor_class_by_rule"  oracle under the 0.5 s floor -> graded on
                           compute parity per the committed rule; the
                           hand-curated `rows` entries remain the
                           deep-dive evidence for headline rows;
  - "NEEDS_ATTENTION"      oracle >= 0.5 s and ratio > 2x -> a genuine
                           perf gap; the tool exits 1 so CI/builder
                           notices.

Usage: python3 tools/floor_class.py <bench_canonical.json> <duck.json>
         [round-label]
Writes the `sweep_adjudication` key into FLOOR_CLASS.json in place.
"""
import json, sys

def main():
    sweep_path, duck_path = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else "unlabeled"
    spark = json.load(open(sweep_path))["runs"]
    duckd = json.load(open(duck_path))
    duck = duckd["queries"]
    fc_path = "FLOOR_CLASS.json"
    fc = json.load(open(fc_path))
    rows = {}
    attention = 0
    for q, s in sorted(spark.items()):
        d = duck.get(q)
        if d is None or d <= 0 or s["sec"] < 0:
            continue
        ratio = s["sec"] / d
        if ratio <= 2.0:
            continue
        needs = d >= 0.5
        rows[q] = {
            "spark_sec": round(s["sec"], 3),
            "oracle_sec_oneshot": d,
            "ratio": round(ratio, 1),
            "disposition": "NEEDS_ATTENTION" if needs
                else "floor_class_by_rule",
            "curated_entry": q in fc.get("rows", {}),
        }
        attention += 1 if needs else 0
    fc["sweep_adjudication"] = {
        "round": label,
        "sweep": sweep_path,
        "oracle_timing": duckd.get("sf", ""),
        "rule": "every row >2x wall ratio in the kept canonical sweep, "
                "adjudicated mechanically: oracle under the 0.5 s floor "
                "=> floor-class by the committed rule (graded on compute "
                "parity); oracle >= 0.5 s => NEEDS_ATTENTION (tool exits "
                "nonzero)",
        "n_over_2x": len(rows),
        "n_needs_attention": attention,
        "rows": rows,
    }
    json.dump(fc, open(fc_path, "w"), indent=1)
    print(f"{len(rows)} rows >2x; {attention} need attention")
    sys.exit(1 if attention else 0)

if __name__ == "__main__":
    main()
