#!/usr/bin/env python3
"""Per-query bench diff between two committed bench_full_rN.json maps.

Usage: python3 tools/bench_diff.py bench_full_r16.json bench_full_r17.json [N]

Prints a markdown table of the top-N regressions and top-N improvements
(absolute seconds), plus totals and the queries present on only one side.
The INGEST canary normalizes ingest ambient only — q/text/stream family
times move +/-20% across sessions on unchanged code (see the BASELINE
round-16 cap-metric ledger line), so single-query deltas below ~0.5 s
are ambient until an in-session A/B says otherwise.
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    deltas = sorted(((nq[k] - oq[k], k) for k in shared), reverse=True)

    def row(d, k):
        return f"| {k} | {oq[k]:.2f} | {nq[k]:.2f} | {d:+.2f} |"

    print(f"old total {old['value']:.2f}s/{len(oq)}q  "
          f"new total {new['value']:.2f}s/{len(nq)}q  "
          f"shared-query sum {sum(oq[k] for k in shared):.2f} -> "
          f"{sum(nq[k] for k in shared):.2f}s")
    print(f"\nTop {top_n} regressions (shared queries):\n")
    print("| query | old s | new s | delta |\n|---|---|---|---|")
    for d, k in deltas[:top_n]:
        print(row(d, k))
    print(f"\nTop {top_n} improvements:\n")
    print("| query | old s | new s | delta |\n|---|---|---|---|")
    for d, k in reversed(deltas[-top_n:]):
        print(row(d, k))
    if only_new:
        print(f"\nNew queries: " + ", ".join(
            f"{k} ({nq[k]:.2f}s)" for k in only_new))
    if only_old:
        print(f"\nRetired queries: " + ", ".join(only_old))


if __name__ == "__main__":
    main()
