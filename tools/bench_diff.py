#!/usr/bin/env python3
"""Per-query bench diff between two committed bench_full_rN.json maps.

Usage: python3 tools/bench_diff.py bench_full_r16.json bench_full_r17.json [N]

Prints a markdown table of the top-N regressions and top-N improvements
(absolute seconds), plus totals and the queries present on only one side.

Two ambient canaries annotate the diff (r17 ask #3):
  - canary_ratio      — INGEST ambient (session ingest rows/s / best).
  - query_probe_ratio — SHUFFLE+CPU ambient (best probe sec / session),
    the regime most queries live in; the ingest canary is triple-confirmed
    blind to it (three same-session r17 runs: graph family +/-27-44% on
    identical code while the ingest canary moved the opposite way).
Both ratios are oriented >1.0 = session FASTER than the recorded best, so
ambient-corrected time = raw * ratio. When both artifacts carry
query_probe_ratio the tables add a probe-normalized delta column; deltas
whose sign flips under normalization are ambient, not code.
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

    op, np_ = old.get("query_probe_ratio"), new.get("query_probe_ratio")
    both_probes = op is not None and np_ is not None

    def canaries(tag, art):
        parts = []
        if art.get("canary_ratio") is not None:
            parts.append(f"ingest canary {art['canary_ratio']:.3f}")
        if art.get("query_probe_ratio") is not None:
            parts.append(f"query probe {art['query_probe_ratio']:.3f}"
                         f" ({art.get('query_probe_sec', float('nan')):.2f}s)")
        return f"{tag}: " + (", ".join(parts) if parts else "no canaries")

    def row(d, k):
        base = f"| {k} | {oq[k]:.2f} | {nq[k]:.2f} | {d:+.2f} |"
        if both_probes:
            nd = nq[k] * np_ - oq[k] * op
            flag = " ambient" if (nd > 0) != (d > 0) or abs(nd) < 0.1 else ""
            base += f" {nd:+.2f}{flag} |"
        return base

    hdr = ("| query | old s | new s | delta |"
           + (" probe-norm delta |" if both_probes else ""))
    sep = "|---|---|---|---|" + ("---|" if both_probes else "")

    print(f"old total {old['value']:.2f}s/{len(oq)}q  "
          f"new total {new['value']:.2f}s/{len(nq)}q  "
          f"shared-query sum {sum(oq[k] for k in shared):.2f} -> "
          f"{sum(nq[k] for k in shared):.2f}s")
    print(canaries("old", old))
    print(canaries("new", new))
    if both_probes:
        print(f"probe-normalized shared sum "
              f"{sum(oq[k] for k in shared) * op:.2f} -> "
              f"{sum(nq[k] for k in shared) * np_:.2f}s  "
              f"(raw * ratio = cost at best-recorded ambient; 'ambient' "
              f"flags a delta that shrinks below 0.1s or flips sign)")
    else:
        print("(no query_probe_ratio on one side — per-query deltas below "
              "~0.5 s are ambient until an in-session A/B says otherwise)")
    print(f"\nTop {top_n} regressions (shared queries):\n")
    print(hdr + "\n" + sep)
    for d, k in deltas[:top_n]:
        print(row(d, k))
    print(f"\nTop {top_n} improvements:\n")
    print(hdr + "\n" + sep)
    for d, k in reversed(deltas[-top_n:]):
        print(row(d, k))
    if only_new:
        print(f"\nNew queries: " + ", ".join(
            f"{k} ({nq[k]:.2f}s)" for k in only_new))
    if only_old:
        print(f"\nRetired queries: " + ", ".join(only_old))


if __name__ == "__main__":
    main()
