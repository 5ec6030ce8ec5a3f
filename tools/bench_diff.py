#!/usr/bin/env python3
"""Per-query bench diff — the round's steal-band adjudication as one command.

Compares two bench artifacts (BENCH_LAST.json, or a driver BENCH_r{N}.json
whose per-query map sits under `parsed`), restricted to the queries present
in BOTH ("carried" queries):

  * median + quartile carried per-query ratio (current / prior) — a tight,
    uniform median shifted away from 1.0 with no structural mover is the
    signature of the host's CPU-steal band (r4/r6/r11 pattern), not a code
    regression;
  * movers: carried queries whose ratio exceeds the threshold (default
    1.5x) in either direction, sorted worst-first — these are the lines
    that need a code-level explanation (a diff touching their family) or
    an isolated BENCH_ONLY re-run;
  * additions / removals relative to the prior artifact, with their cost.

Usage:
  tools/bench_diff.py PRIOR.json CURRENT.json [--threshold 1.5] [--json]

Driver artifacts truncate the per-query map to the most expensive ~55
queries; the carried set is the intersection, and the summary names how
many queries each side contributed so a truncated comparison is visible.
"""
import argparse
import json
import statistics
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"], d.get("value")
    if "parsed" in d and "queries" in d["parsed"]:
        return d["parsed"]["queries"], d["parsed"].get("value")
    raise SystemExit(f"{path}: no per-query map found (queries / parsed.queries)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prior")
    ap.add_argument("current")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="mover flag: ratio above this (or below 1/this)")
    ap.add_argument("--json", action="store_true", help="machine output only")
    args = ap.parse_args()

    prior, prior_total = load_queries(args.prior)
    cur, cur_total = load_queries(args.current)

    carried = sorted(set(prior) & set(cur))
    added = sorted(set(cur) - set(prior))
    removed = sorted(set(prior) - set(cur))

    # A zero-time prior query has no defined ratio: keep it out of the
    # ratio stats (a bare Infinity is invalid JSON downstream) and flag
    # it separately so the comparison stays visibly complete.
    zero_prior = sorted(q for q in carried if prior[q] <= 0)
    ratios = {q: cur[q] / prior[q] for q in carried if prior[q] > 0}
    rvals = sorted(ratios.values())
    med = statistics.median(rvals) if rvals else None
    q1 = rvals[len(rvals) // 4] if rvals else None
    q3 = rvals[(3 * len(rvals)) // 4] if rvals else None
    movers = sorted(
        ((q, r) for q, r in ratios.items()
         if r > args.threshold or r < 1.0 / args.threshold),
        key=lambda t: -max(t[1], 1.0 / t[1]))

    out = {
        "prior": args.prior, "current": args.current,
        "prior_total": prior_total, "current_total": cur_total,
        "n_prior": len(prior), "n_current": len(cur),
        "n_carried": len(carried),
        "carried_ratio_median": round(med, 3) if med is not None else None,
        "carried_ratio_q1": round(q1, 3) if q1 is not None else None,
        "carried_ratio_q3": round(q3, 3) if q3 is not None else None,
        "zero_prior": [{"query": q, "current": cur[q],
                        "note": "prior time 0 — ratio undefined"}
                       for q in zero_prior],
        "carried_sec_prior": round(sum(prior[q] for q in carried), 1),
        "carried_sec_current": round(sum(cur[q] for q in carried), 1),
        "threshold": args.threshold,
        "movers": [{"query": q, "prior": prior[q], "current": cur[q],
                    "ratio": round(r, 2)} for q, r in movers],
        "added": [{"query": q, "sec": cur[q]} for q in added],
        "removed": [{"query": q, "sec": prior[q]} for q in removed],
        "added_sec": round(sum(cur[q] for q in added), 1),
    }
    # uniform-band heuristic: median notably off 1.0 but quartiles tight
    # around it and no mover -> environmental, not structural
    if med is not None and q1 is not None and q3 is not None:
        out["band_verdict"] = (
            "uniform-environmental" if not movers and abs(med - 1.0) > 0.1
            and (q3 - q1) < 0.25 else
            "stable" if not movers else "has-movers")

    print(json.dumps(out, indent=None if args.json else 2))
    if not args.json and movers:
        print(f"\n{len(movers)} mover(s) beyond {args.threshold}x "
              "— explain via a code diff or an isolated re-run:",
              file=sys.stderr)
        for m in out["movers"][:20]:
            print(f"  {m['query']}: {m['prior']} -> {m['current']} "
                  f"({m['ratio']}x)", file=sys.stderr)


if __name__ == "__main__":
    main()
