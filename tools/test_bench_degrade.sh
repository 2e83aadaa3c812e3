#!/usr/bin/env bash
# Proves the bench parent degrades gracefully (r15 verdict #2) instead of
# shipping `parsed: null` like the r13/r15 official runs:
#   case 1 — internal soft deadline: units past SPARK_GRAFT_BENCH_DEADLINE_SEC
#            are never launched; the parent exits 0 with completed queries
#            measured and the rest in an explicit "skipped" list (and the
#            deadline-declined subset called out as "skipped_deadline").
#   case 2 — kill -TERM mid-run (the driver's timeout wrapper): the shutdown
#            hook prints the partial one-line artifact to stdout and the
#            incrementally-rewritten artifact file holds the same state.
#   case 3 — parent launched under a huge -Xmx (the r16 driver ran sbt at
#            -Xmx89g, which the old inherit-the-parent's-heap child config
#            turned into par=1 and 164 skipped queries): the child heap is
#            now PINNED to 8g, so par must stay > 1 and the occupancy
#            record must show the pinned flag, not the parent's.
#   case 4 — heavies-first submission: with a full light chunk sorting
#            BEFORE a heavy, a deadline-degraded run must still measure
#            the heavy and skip only the light chunk (r16 verdict #3: the
#            r16 official run lost every stream_* heavy because completed
#            units were an alphabetical prefix).
#   case 5 — rep shedding + reserved light lane (r17 verdict #1): under
#            deadline pressure (SHED_FRAC forced to ~0) a run must
#            complete ALL units — heavies at 1 shed rep listed in
#            "reps_shed", skipped list EMPTY — instead of skipping
#            queries; the light chunk must start near t=0 in the
#            occupancy record (its reserved lane never waits on the
#            heavy tail), and the artifact must carry a parseable
#            noise_control with pre AND post probes.
# Run from the repo root after `sbt -batch compile`. ~4 min.
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
CP="$CLASSES:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

# three units in fixed sorted order: [dfs_leaves] [triangle_counts] [bfs_levels]
COMMON_ENV=(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
  SPARK_GRAFT_ONLY=bfs_levels,dfs_leaves,triangle_counts
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PAR=1 SPARK_GRAFT_REPS=1)

check() { # $1 = artifact file, $2 = label
  python3 - "$1" "$2" <<'EOF'
import json, sys
art, label = sys.argv[1], sys.argv[2]
d = json.load(open(art))
measured = {k: v for k, v in d["queries"].items() if v >= 0}
assert measured, f"{label}: no completed queries in {art}"
assert d["skipped"], f"{label}: skipped list empty in {art}"
assert set(measured) | set(d["skipped"]) | set(d["errors"]) == \
    {"bfs_levels", "dfs_leaves", "triangle_counts"}, f"{label}: query set wrong"
print(f"{label}: OK - measured={sorted(measured)} skipped={sorted(d['skipped'])}")
EOF
}

echo "== case 1: soft deadline (unit 1 runs, units 2-3 skipped; exit 0) =="
rm -f /tmp/bench_degrade1.json /tmp/bench_degrade1_occ.json
env "${COMMON_ENV[@]}" SPARK_GRAFT_BENCH_DEADLINE_SEC=1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_degrade1.json \
  SPARK_GRAFT_BENCH_OCC=/tmp/bench_degrade1_occ.json \
  java $OPENS -Xmx4g -cp "$CP" graft.Bench > /tmp/bench_degrade1.out 2>/dev/null
grep -q '"skipped"' /tmp/bench_degrade1.json
check /tmp/bench_degrade1.json "deadline"
python3 -c "
import json
tail=[l for l in open('/tmp/bench_degrade1.out') if l.strip().startswith('{')]
d=json.loads(tail[-1]); assert d['n_skipped']>0, d
print('deadline: stdout tail line parses, n_skipped=%d' % d['n_skipped'])"

echo "== case 2: kill -TERM mid-run (hook emits partial artifact) =="
rm -f /tmp/bench_degrade2.json /tmp/bench_degrade2_occ.json
set +e
env "${COMMON_ENV[@]}" SPARK_GRAFT_BENCH_DEADLINE_SEC=10000 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_degrade2.json \
  SPARK_GRAFT_BENCH_OCC=/tmp/bench_degrade2_occ.json \
  timeout -s TERM 40 java $OPENS -Xmx4g -cp "$CP" graft.Bench \
  > /tmp/bench_degrade2.out 2>/dev/null
rc=$?
set -e
[ "$rc" -eq 124 ] || { echo "expected rc 124 from timeout, got $rc" >&2; exit 1; }
sleep 1   # let the hook's file write land
check /tmp/bench_degrade2.json "kill-term"
python3 -c "
import json
tail=[l for l in open('/tmp/bench_degrade2.out') if l.strip().startswith('{')]
assert tail, 'no JSON on stdout after SIGTERM - shutdown hook did not emit'
d=json.loads(tail[-1]); assert d['n_skipped']>0, d
print('kill-term: stdout tail line parses after SIGTERM, n_skipped=%d' % d['n_skipped'])"
python3 -c "
import json
occ=json.load(open('/tmp/bench_degrade2_occ.json'))
opens=[u for u in occ['units'] if u.get('open')]
print('kill-term: occupancy has %d unit spans (%d open at kill time)' % (len(occ['units']), len(opens)))"

echo "== case 3: huge parent -Xmx does not collapse the pool (child heap pinned) =="
rm -f /tmp/bench_degrade3.json /tmp/bench_degrade3_occ.json
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_ONLY=q1_agg,top_revenue \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_degrade3.json \
  SPARK_GRAFT_BENCH_OCC=/tmp/bench_degrade3_occ.json \
  java $OPENS -Xmx80g -cp "$CP" graft.Bench > /tmp/bench_degrade3.out 2>/dev/null
python3 -c "
import json
occ=json.load(open('/tmp/bench_degrade3_occ.json'))
assert occ['par'] > 1, f\"par collapsed under a huge parent -Xmx: {occ['par']}\"
assert occ['child_xmx'] == '-Xmx8g', f\"child heap not pinned: {occ['child_xmx']}\"
d=json.load(open('/tmp/bench_degrade3.json'))
measured={k:v for k,v in d['queries'].items() if v>=0}
assert set(measured)=={'q1_agg','top_revenue'}, measured
print('huge-xmx: OK - par=%d child_xmx=%s, both queries measured' % (occ['par'], occ['child_xmx']))"

echo "== case 4: heavies submitted first (degraded run keeps the heavy) =="
# 20 light queries that sort alphabetically BEFORE the heavy triangle_counts
# form one full light chunk = unit 0; [triangle_counts] = unit 1. With
# heavies-first submission and a 1s deadline, the heavy must be the one
# measured and the light chunk the one skipped (marked skipped_deadline).
LIGHTS=ab_test_conversion,above_avg_orders,asof_last_order,attribution_last_touch
LIGHTS=$LIGHTS,audio_vad_segments,banded_scan_revenue,bigram_freq_top50,bigram_lm_score
LIGHTS=$LIGHTS,bigram_pmi_top50,bloom_semijoin,bm25_top_docs,bpe_doc_token_counts
LIGHTS=$LIGHTS,bpe_merges,bpe_token_freqs,char_entropy,cms_term_counts
LIGHTS=$LIGHTS,cohort_retention,compression_ratio,corpus_profile,cube_orders
rm -f /tmp/bench_degrade4.json /tmp/bench_degrade4_occ.json
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_ONLY=$LIGHTS,triangle_counts \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PAR=1 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_DEADLINE_SEC=1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_degrade4.json \
  SPARK_GRAFT_BENCH_OCC=/tmp/bench_degrade4_occ.json \
  java $OPENS -Xmx4g -cp "$CP" graft.Bench > /tmp/bench_degrade4.out 2>/dev/null
python3 -c "
import json
d=json.load(open('/tmp/bench_degrade4.json'))
measured={k:v for k,v in d['queries'].items() if v>=0}
assert 'triangle_counts' in measured, f'heavy not measured first: {sorted(measured)}'
assert 'triangle_counts' not in d['skipped'], d['skipped']
assert len(d['skipped'])==20 and set(d['skipped'])==set(d['skipped_deadline']), \
    (len(d['skipped']), len(d.get('skipped_deadline',[])))
print('heavies-first: OK - heavy measured (%.2fs), %d lights deadline-skipped'
      % (measured['triangle_counts'], len(d['skipped_deadline'])))"

echo "== case 5: deadline pressure sheds REPS, not queries; light lane reserved =="
# two heavies + one (partial) light chunk; SHED_FRAC≈0 puts the run under
# pressure from t=0, the deadline itself has headroom — everything must
# complete, heavies at 1 rep each, nothing skipped. CPUS=8 → par=2: one
# light-first lane + one heavy-first lane.
rm -f /tmp/bench_degrade5.json /tmp/bench_degrade5_occ.json
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_ONLY=q1_agg,top_revenue,bloom_semijoin,cohort_retention,dfs_leaves,triangle_counts \
  SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_DEADLINE_SEC=500 SPARK_GRAFT_BENCH_SHED_FRAC=0.0 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_degrade5.json \
  SPARK_GRAFT_BENCH_OCC=/tmp/bench_degrade5_occ.json \
  java $OPENS -Xmx4g -cp "$CP" graft.Bench > /tmp/bench_degrade5.out 2>/tmp/bench_degrade5.err
python3 -c "
import json
d=json.load(open('/tmp/bench_degrade5.json'))
measured={k:v for k,v in d['queries'].items() if v>=0}
assert len(measured)==6 and not d['skipped'] and not d['errors'], \
    (sorted(measured), d['skipped'], d['errors'])
assert set(d['reps_shed'])=={'dfs_leaves','triangle_counts'}, d['reps_shed']
nc=d['noise_control']
for leg in ('pre','post'):
    assert nc[leg]['cpu_spin_sec']>0 and nc[leg]['disk_write_mb_s']>0, nc
occ=json.load(open('/tmp/bench_degrade5_occ.json'))
light=[u for u in occ['units'] if 'q1_agg' in u['queries']][0]
assert light['start_sec']<5.0, \
    f\"light chunk waited on the heavy tail: start={light['start_sec']}\"
# r19: every COMPLETED unit carries its own ~100ms mini noise probe in
# the occupancy record (localizes mid-run contention windows) — assert
# they parse and carry the probe fields
probed=[u for u in occ['units'] if u.get('probe')]
assert probed, 'no per-unit noise probes in the occupancy record'
for u in probed:
    p=u['probe']
    assert p['cpu_spin_sec']>0 and p['disk_read_mb_s']>0 and p['kind']=='mini', p
err=open('/tmp/bench_degrade5.err').read()
assert 'REPS SHED' in err, 'parent never logged the shed decision'
print('rep-shed: OK - all 6 measured, 0 skipped, reps_shed=%s, light lane start=%.1fs, noise pre/post present, %d per-unit probes parse'
      % (sorted(d['reps_shed']), light['start_sec'], len(probed)))"
echo "== bench degradation: ALL OK =="
