#!/usr/bin/env bash
# Per-query-JVM soak: one sbt/Spark JVM per query (in-session isolation is
# not enough across many queries — codegen/metaspace growth inflated late
# queries up to 6x in a shared 16-query session, measured round 10), then
# merge the per-query artifacts into SOAK_sf1.json.
set -euo pipefail
cd "$(dirname "$0")/.."
PARTS=${SOAK_PARTS_DIR:-/tmp/graft_soak_parts}
mkdir -p "$PARTS"
# stale parts from an aborted or differently-configured earlier run must
# not leak into the merged artifact
rm -f "$PARTS"/*.json
# the authoritative query list comes from Soak itself, not a source scrape
QUERIES=$(sbt -batch 'runMain graft.Soak --list' 2>/dev/null \
  | sed -n 's/^SOAK_QUERIES: //p')
[ -n "$QUERIES" ] || { echo "could not obtain SlowQueries list" >&2; exit 1; }
for q in $QUERIES; do
  echo "== soaking $q" >&2
  SPARK_GRAFT_SOAK_ONLY="$q" SPARK_GRAFT_SOAK_OUT="$PARTS/$q.json" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch 'runMain graft.Soak' >/dev/null 2>&1 \
    || { echo "SOAK FAILED for $q" >&2; exit 1; }
done
python3 - "$PARTS" "$(echo "$QUERIES" | wc -w)" <<'EOF'
import json, sys, glob, os
parts = sorted(glob.glob(os.path.join(sys.argv[1], '*.json')))
expected = int(sys.argv[2])
queries, notes, probes = {}, {}, []
noise_ok = True
meta = None
for p in parts:
    d = json.load(open(p))
    # all parts must have been measured under ONE config — a part rerun
    # with e.g. SPARK_GRAFT_SOAK_SHUFFLE=128 must not silently merge into
    # an artifact that reports a single config for mixed measurements
    # order-swapped adjudication runs (SPARK_GRAFT_SOAK_ORDER) self-label
    # and must never merge into the committed artifact
    assert 'order' not in d, f"part {p} is an order-swapped adjudication run"
    cfg = (d['copies'], d['src'], d.get('shuffle_partitions'))
    if meta is not None:
        prev = (meta['copies'], meta['src'], meta.get('shuffle_partitions'))
        assert cfg == prev, f"part {p} config {cfg} != {prev} — rerun under one config"
    meta = d
    queries.update(d['queries'])
    notes.update(d.get('notes', {}))
    nc = d.get('noise_control')
    if nc:
        probes += [nc['pre'], nc['post']]
    # each part self-gates (rc 3 outside the idle band, caught above) —
    # this is the merged record of that evidence
    noise_ok = noise_ok and d.get('noise_ok', False)
assert len(queries) == expected, \
    f"merged {len(queries)} queries, expected {expected} — stale or missing parts"
out = {'copies': meta['copies'], 'src': meta['src'],
       'shuffle_partitions': meta.get('shuffle_partitions'),
       'isolation': 'one JVM per query (tools/soak_all.sh), median of reps',
       'queries': queries, 'notes': notes,
       'max_ratio': max(q['ratio'] for q in queries.values()),
       'noise_ok': noise_ok}
if probes:
    out['noise_worst'] = {
        'cpu_spin_sec': max(p['cpu_spin_sec'] for p in probes),
        'disk_read_mb_s': min(p['disk_read_mb_s'] for p in probes)}
json.dump(out, open('SOAK_sf1.json', 'w'))
print(json.dumps(out))
EOF
