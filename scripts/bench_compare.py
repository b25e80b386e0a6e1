#!/usr/bin/env python
"""Compare two bench artifacts per query: ratios, medians, movers.

Accepts any mix of (a) driver BENCH_r{N}.json round artifacts (the
per-query map is inside the truncated ``tail`` capture — partial-map
recovery below), (b) bench_detail.json files, (c) raw bench.py stdout
JSON lines. Prints the median per-query ratio (the uniform-host-shift
statistic VERDICT r7 used), the aggregate ratio over common queries, and
every mover beyond ``--threshold`` (default 1.5x either way), so the
"which queries actually moved vs which is the whole band" question is one
command instead of a hand join:

    python scripts/bench_compare.py BENCH_r07.json bench_detail.json
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc and isinstance(doc["queries"], dict):
        return {k: float(v) for k, v in doc["queries"].items()}
    if "tail" in doc:
        # driver artifact: the tail is the LAST ~2,000 chars of stdout — the
        # per-query map may be truncated at the FRONT, so recover every
        # complete "name": number pair instead of parsing JSON.
        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', doc["tail"])
        out = {}
        for k, v in pairs:
            if k in ("value", "sf"):  # summary-line fields, not queries
                continue
            out[k] = float(v)
        return out
    raise SystemExit(f"{path}: no per-query map found")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            thr = float(a.split("=", 1)[1])
    if len(args) != 2:
        raise SystemExit("usage: bench_compare.py OLD.json NEW.json "
                         "[--threshold=1.5]")
    old, new = load_queries(args[0]), load_queries(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    ratios = sorted(new[q] / old[q] for q in common if old[q] > 0)
    median = ratios[len(ratios) // 2]
    agg_old = sum(old[q] for q in common)
    agg_new = sum(new[q] for q in common)
    print(json.dumps({
        "common": len(common),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "median_ratio": round(median, 3),
        "aggregate_ratio": round(agg_new / agg_old, 3),
        "aggregate_old_s": round(agg_old, 1),
        "aggregate_new_s": round(agg_new, 1),
    }))
    movers = [
        (q, old[q], new[q], round(new[q] / old[q], 2))
        for q in common
        if old[q] > 0 and (new[q] / old[q] >= thr or new[q] / old[q] <= 1 / thr)
    ]
    for q, o, n, r in sorted(movers, key=lambda t: -t[3]):
        print(json.dumps({"query": q, "old": o, "new": n, "ratio": r}))


if __name__ == "__main__":
    main()
