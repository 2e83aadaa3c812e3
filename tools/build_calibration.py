#!/usr/bin/env python3
"""Merge the two same-session calibration legs into BENCH_CALIBRATION.json.

Usage: python3 tools/build_calibration.py <seq.json> <par.json> <round>

Each leg is a graft.Bench artifact restricted to the Heavy set:
  seq: SPARK_GRAFT_BENCH_PAR=1, SPARK_GRAFT_CPUS=32  -> local[32] children,
       one at a time (the r11-r13 configuration)
  par: default 4-way pool, SPARK_GRAFT_CPUS=32       -> 4 x local[8]
The per-query ratio par/seq is the thread-slice correction to apply when
adjudicating official 4-way medians against the sequential-era history
(r14 verdict #1: extend the 6-query bridge to EVERY heavy unit).
"""
import json
import sys


def main() -> None:
    seq_path, par_path, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    seq = json.load(open(seq_path))
    par = json.load(open(par_path))
    sq, pq = seq["queries"], par["queries"]
    assert set(sq) == set(pq), (
        f"leg query sets differ: {set(sq) ^ set(pq)} — rerun both legs"
    )
    bad = [q for q in sq if sq[q] < 0 or pq[q] < 0]
    assert not bad, f"errored queries in a calibration leg: {bad}"
    ratios = {q: round(pq[q] / sq[q], 3) for q in sorted(sq)}
    out = {
        "round": rnd,
        "method": (
            "same-session, EVERY heavy unit, driver-like invocation "
            "(SPARK_GRAFT_CPUS=32, REPS=3 medians): sequential units with "
            "local[32] children (the r11-r13 configuration) vs the default "
            "4-way pool with the thread budget split (4 x local[8] "
            "children, box exactly subscribed). r15 extends the r14 "
            "6-query bridge to the full heavy set (r14 verdict #1) so "
            "every official median >=2s has a per-query thread-slice "
            "ratio; BENCH_OCCUPANCY.json additionally records each "
            "unit's co-runner mix per official run."
        ),
        "sequential_local32": {q: round(sq[q], 3) for q in sorted(sq)},
        "parallel4_local8": {q: round(pq[q], 3) for q in sorted(pq)},
        "ratio_parallel_over_sequential": ratios,
        "ratio_median": round(sorted(ratios.values())[len(ratios) // 2], 3),
        "ratio_worst": max(ratios.items(), key=lambda kv: kv[1]),
        "wall_clock_sec": {
            "sequential_units": round(seq.get("value", 0), 1),
            "parallel4_units": round(par.get("value", 0), 1),
        },
        "notes": (
            "per-query medians inflate by the thread-slice factor when "
            "pooled; apply these ratios when adjudicating official 4-way "
            "medians against sequential-era (r12/r13) numbers. "
            "Round-over-round comparisons WITHIN the 4-way configuration "
            "need no correction. Wall-clock fields are the sum of "
            "per-query medians per leg (not elapsed wall), comparable "
            "across rounds."
        ),
    }
    json.dump(out, open("BENCH_CALIBRATION.json", "w"), indent=1)
    print(json.dumps({
        "queries": len(ratios),
        "ratio_median": out["ratio_median"],
        "ratio_worst": out["ratio_worst"],
    }))


if __name__ == "__main__":
    main()
