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
within one run).

Record gate: CONVERGENCE of the min, not band width. The across-run
spread of raw mins IS the machine's +/-13% band and never shrinks
with more runs — the estimator that converges is the per-query MIN.
So the gate asks: did adding the NEWEST run lower any >5s query's
min by more than 5%? If yes, the floor was still moving — add
another quiet run. If no, the record is stable and commits. The band
spread is still printed as context.
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
        prior = [run_min(e) for p, e in entries[:-1]
                 if run_min(e) < float("inf")]
        if len(mins) >= 2:
            spread = (max(mins) - min(mins)) / min(mins)
            # convergence: how much did the newest run lower the min?
            drop = ((min(prior) - min(mins)) / min(mins)) if prior else 0.0
            spreads.append((name, min(mins), spread, drop))

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
    print(f"{'query':40s} {'min_s':>8s} {'band':>7s} {'lastdrop':>8s}")
    for name, lo, spread, drop in sorted(spreads, key=lambda s: -s[1]):
        flag = ""
        if lo > HEAVY_SEC and drop > SPREAD_GATE:
            flag = "  <-- newest run still lowered the min >5%"
            bad.append(name)
        if lo > 1.0 or flag:
            print(f"{name:40s} {lo:8.2f} {spread:6.1%} {drop:7.1%}{flag}")
    if bad:
        print(f"== GATE FAIL: {len(bad)} heavy queries' mins were still "
              "dropping on the newest run — add another quiet run: "
              + ", ".join(bad))
        return 1
    print("== GATE PASS: the newest run lowered no >5s query's min by "
          ">5% — the floor has converged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
