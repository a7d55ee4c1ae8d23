"""User-study aggregation (ref: analyze_results.py:11-129).

Reads the study responses CSV (columns per method/dimension), computes
weighted averages on the 1-5 scale per dimension (Blending Quality, Video
Consistency, Character Consistency, Overall Quality) per method, and prints
a JSON summary (no matplotlib dependency in the hot path; pass --plot to
render a bar chart if matplotlib is available).
"""

from __future__ import annotations

import argparse
import csv
import json
import re
from collections import defaultdict


DIMENSIONS = {
    "BQ": ["blending"],
    "VC": ["video consistency", "temporal"],
    "CC": ["character", "identity"],
    "OQ": ["overall"],
}


def classify(column: str):
    c = column.lower()
    for dim, keys in DIMENSIONS.items():
        if any(k in c for k in keys):
            return dim
    return None


def analyze(path: str):
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        rows = list(reader)
    scores = defaultdict(list)  # (method_hint, dim) -> [values]
    for row in rows:
        for col, val in row.items():
            dim = classify(col or "")
            if dim is None or val is None:
                continue
            m = re.search(r"\d+", str(val))
            if not m:
                continue
            v = int(m.group())
            if not 1 <= v <= 5:
                continue
            scores[(col, dim)].append(v)
    # aggregate per dimension (weighted by response count per column)
    agg = defaultdict(lambda: [0, 0])
    for (_, dim), vals in scores.items():
        agg[dim][0] += sum(vals)
        agg[dim][1] += len(vals)
    return {dim: round(s / n, 3) for dim, (s, n) in agg.items() if n}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("csv_path")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()
    result = analyze(args.csv_path)
    print(json.dumps(result))
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.bar(result.keys(), result.values())
        plt.ylim(0, 5)
        plt.ylabel("mean score (1-5)")
        plt.savefig(args.csv_path + ".png", dpi=120)
