"""Render the cross-family campaign summary as a markdown table.

Reads <save-path>/run_all_summary.json (the MERGED summary maintained by
scripts/run_all.py) and prints a table per harness, rows = equation/dim,
columns = GP / MLP / SCaSML rel-L2.  Used to refresh reports/RESULTS.md.

    python scripts/summarize_campaign.py [--save-path reports/campaign]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-path", default="reports/campaign")
    args = ap.parse_args()

    with open(f"{args.save_path}/run_all_summary.json") as fh:
        summary = json.load(fh)

    by_harness = defaultdict(dict)
    for key, row in sorted(summary.items()):
        parts = key.split("/")
        if len(parts) != 4:
            continue
        eqn, dim, variant, harness = parts
        rel = row.get("metrics", {}).get("rel_L2")
        if not isinstance(rel, dict):
            rel = {"error": row.get("error", "?")}
        by_harness[harness][(eqn, dim, variant)] = rel

    for harness, rows in by_harness.items():
        print(f"\n### {harness}\n")
        print("| equation | d | variant | GP | MLP | SCaSML |")
        print("|---|---|---|---|---|---|")
        for (eqn, dim, variant), rel in rows.items():
            def f(k):
                v = rel.get(k)
                if isinstance(v, float):
                    return f"{v:.4f}"
                if isinstance(v, list) and v and all(
                    isinstance(x, (int, float)) for x in v
                ):
                    # sweep harness: show the budget trajectory ends
                    return f"{v[0]:.4f} → {v[-1]:.4f}"
                return "—"
            print(f"| {eqn} | {dim} | {variant} | {f('GP')} | {f('MLP')} |"
                  f" **{f('SCaSML')}** |")


if __name__ == "__main__":
    main()
