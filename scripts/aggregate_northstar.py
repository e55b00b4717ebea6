"""Aggregate per-family north-star runs into one artifact + table.

The round-5 queue runs `scripts/bench_northstar.py --families <f>` as one
process per family (relay-stall isolation: a worker-restart or outage
kills at most one family, and the retry machinery re-runs just that one).
Each invocation prints its family JSON line plus its own single-family
summary; this script keeps the LAST line per family (retries supersede
earlier failures), recomputes the grid-wide summary, writes the JSON
artifact, and prints the BASELINE.md markdown table.

    python scripts/aggregate_northstar.py /tmp/northstar.log \
        --out NORTHSTAR_r05.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logs", nargs="+", help="log file(s) of bench_northstar runs")
    ap.add_argument("--out", default=None, help="write the JSON artifact here")
    ap.add_argument(
        "--baseline", default=None,
        help="override BASELINE_MEASURED.json seqs_per_sec",
    )
    args = ap.parse_args()

    base_sps = float(args.baseline) if args.baseline else None
    if base_sps is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BASELINE_MEASURED.json",
        )
        with open(path) as f:
            base_sps = json.load(f)["seqs_per_sec"]

    families = {}
    for log in args.logs:
        with open(log) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "family" in rec:  # summary lines have "metric" instead
                    families[rec["family"]] = rec

    if not families:
        raise SystemExit("no family lines found")

    rows = list(families.values())
    total_seqs = sum(r["seqs"] for r in rows)
    total_wall = sum(r["wall_s"] for r in rows)

    # Family-fair denominators where the reference family itself was
    # measured on this machine (scripts/measure_reference_family_baselines
    # .py): the Adalead denominator understates the speedup for families
    # whose reference host loop is much slower than Adalead's (GA's
    # per-child editdistance novelty scans, DQN's per-step Q-training).
    fam_base = {}
    fam_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_FAMILY_MEASURED.json",
    )
    if os.path.exists(fam_path):
        with open(fam_path) as f:
            fam_base = {k: v["seqs_per_sec"] for k, v in json.load(f).items()}

    # Family-fair aggregate: the wall-clock the REFERENCE would need for
    # this exact grid, charging each family's sequences at its own
    # measured reference rate (generic Adalead rate where unmeasured).
    # The flat-denominator vs_baseline below divides the grid-wide
    # seqs/s by the Adalead rate, which charges reference CbAS/DQN/GA
    # work at Adalead prices — family-fair is the honest aggregate.
    ref_wall_fair = sum(
        r["seqs"] / fam_base.get(r["family"], base_sps) for r in rows
    )
    summary = {
        "metric": "northstar_all_explorers_all_landscapes",
        "families": len(rows),
        "total_cells": sum(r["cells"] for r in rows),
        "total_seqs": total_seqs,
        "total_wall_s": round(total_wall, 2),
        "seqs_per_sec": round(total_seqs / total_wall, 1),
        "reference_seqs_per_sec": base_sps,
        "vs_baseline": round(total_seqs / total_wall / base_sps, 2),
        "reference_wall_s_family_fair": round(ref_wall_fair, 1),
        "vs_baseline_family_fair": round(ref_wall_fair / total_wall, 1),
        "family_baselines_measured": sorted(fam_base),
    }

    print("| family | cells | wall (s) | seqs | seqs/s | vs ref Adalead"
          " (3,068/s) | vs ref same-family | mean max_fitness | min |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        fb = fam_base.get(r["family"])
        fair = f"**{r['seqs_per_sec'] / fb:.0f}x**" if fb else "—"
        r["vs_family_baseline"] = (
            round(r["seqs_per_sec"] / fb, 1) if fb else None
        )
        print(
            f"| {r['family']} | {r['cells']} | {r['wall_s']} | {r['seqs']:,}"
            f" | {r['seqs_per_sec']:,} | {r['seqs_per_sec'] / base_sps:.1f}x"
            f" | {fair}"
            f" | {r['mean_max_fitness']} | {r['min_max_fitness']} |"
        )
    print(json.dumps(summary))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"families": rows, "summary": summary}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
