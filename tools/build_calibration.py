#!/usr/bin/env python3
"""Merge the two same-session calibration legs into BENCH_CALIBRATION.json.

Usage: python3 tools/build_calibration.py <seq.json> <par.json> <round>

Each leg is a graft.Bench artifact covering (at least) the Heavy set:
  seq: SPARK_GRAFT_BENCH_PAR=1, SPARK_GRAFT_CPUS=32  -> local[32] children,
       one at a time (the r11-r13 configuration)
  par: default pool, SPARK_GRAFT_CPUS=32             -> since r16 eight
       local[4] children (r14-r15 ran 4 x local[8])
The per-query ratio par/seq is the thread-slice correction to apply when
adjudicating official pooled medians against the sequential-era history
(r14 verdict #1 extended the 6-query bridge to EVERY heavy unit; r16
re-based the pooled leg for the 8-way config). Extra non-heavy queries
in a leg (e.g. when the pooled leg doubles as the round-close full
bench) are ignored — ratios are emitted for the intersection.
"""
import json
import sys


def main() -> None:
    seq_path, par_path, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    seq = json.load(open(seq_path))
    par = json.load(open(par_path))
    sq, pq = seq["queries"], par["queries"]
    common = set(sq) & set(pq)
    assert set(sq) <= set(pq) or set(pq) <= set(sq), (
        f"leg query sets diverge both ways: {set(sq) ^ set(pq)} — rerun"
    )
    sq = {q: sq[q] for q in common}
    pq = {q: pq[q] for q in common}
    bad = [q for q in sq if sq[q] < 0 or pq[q] < 0]
    assert not bad, f"errored queries in a calibration leg: {bad}"
    ratios = {q: round(pq[q] / sq[q], 3) for q in sorted(sq)}
    out = {
        "round": rnd,
        "method": (
            "same-session, EVERY heavy unit, driver-like invocation "
            "(SPARK_GRAFT_CPUS=32, shipped rep config: heavy units 2-rep "
            "mean, heavy stream_* units one untimed warm rep first — r17): "
            "sequential units with local[32] children (the r11-r13 "
            "configuration) vs the default pool with the thread budget "
            "split (8 x local[4] children since r16; 4 x local[8] in "
            "r14-r15 — box exactly subscribed either way). r15 extended "
            "the r14 6-query bridge to the full heavy set (r14 verdict "
            "#1); r16 re-based the pooled leg for the 8-way config; r17 "
            "re-based BOTH legs for the pinned 8g child heap + "
            "stream-warm-rep config (SOAK_ADJUDICATION round17 holds the "
            "per-rep cold/steady A/B behind the warm-rep change). "
            "BENCH_OCCUPANCY.json additionally records each unit's "
            "co-runner mix per official run."
        ),
        "sequential_local32": {q: round(sq[q], 3) for q in sorted(sq)},
        "pooled": {q: round(pq[q], 3) for q in sorted(pq)},
        "pooled_config": "8 x local[4], child heap pinned -Xmx8g, heavies submitted first, stream_* heavies warmed (r17 defaults)",
        "ratio_parallel_over_sequential": ratios,
        "ratio_median": round(sorted(ratios.values())[len(ratios) // 2], 3),
        "ratio_worst": max(ratios.items(), key=lambda kv: kv[1]),
        "wall_clock_sec": {
            "sequential_units": round(sum(v for v in sq.values() if v >= 0), 1),
            "pooled_units": round(sum(v for q, v in par["queries"].items() if q in common and v >= 0), 1),
        },
        "notes": (
            "per-query medians inflate by the thread-slice factor when "
            "pooled; apply these ratios when adjudicating official pooled "
            "medians against sequential-era (r12/r13) numbers, and the "
            "r16/r15 ratio pair when bridging 8-way medians to 4-way-era "
            "(r14/r15) numbers. Round-over-round comparisons WITHIN one "
            "pool configuration need no correction. Wall-clock fields are "
            "the sum of per-query medians per leg (not elapsed wall), "
            "comparable across rounds. r17 basis notes: stream_* heavy "
            "centers are now steady-state (warm rep discards the 1.4-1.6x "
            "cold first rep the r16 2-rep mean charged half-weight — "
            "SOAK_ADJUDICATION round17), so their sequential legs DROP vs "
            "r16 by construction, not by code change; batch heavies stay "
            "unwarmed 2-rep means and carry cold-rep noise on this box "
            "(page cache is not retained between JVMs), worst on "
            "fourclique_counts — same-session per-rep traces: seq-leg reps "
            "41.5/20.8 then re-checks 32.0/23.9/89.3 and 28.0/19.6/18.1, "
            "steady state 18-21s matching the r16 basis (18.5); treat "
            "fourclique seq/pooled movement beyond that band as rep1/GC "
            "noise before suspecting the plan (the 89s outlier was a "
            "one-off GC/IO stall, not reproducible)."
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
