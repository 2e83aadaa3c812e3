#!/usr/bin/env bash
# Proves the bench parent degrades gracefully (r15 verdict #2) instead of
# shipping `parsed: null` like the r13/r15 official runs:
#   case 1 — internal soft deadline: units past SPARK_GRAFT_BENCH_DEADLINE_SEC
#            are never launched; the parent exits 0 with completed queries
#            measured and the rest in an explicit "skipped" list.
#   case 2 — kill -TERM mid-run (the driver's timeout wrapper): the shutdown
#            hook prints the partial one-line artifact to stdout and the
#            incrementally-rewritten artifact file holds the same state.
# Run from the repo root after `sbt -batch compile`. ~2 min.
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
  timeout -s TERM 30 java $OPENS -Xmx4g -cp "$CP" graft.Bench \
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
echo "== bench degradation: ALL OK =="
