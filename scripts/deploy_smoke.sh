#!/usr/bin/env bash
# End-to-end deployment smoke: package the library, then drive the
# production entry points with spark-submit — synthesize access logs,
# ETL them into date-partitioned fact tables, and serve a report JSON
# (warm second request comes from the .ir2 file cache, no Spark).
#
# This is the path a NEW deployment follows (README "Deploying");
# everything the engine needs ships in the package: the robots UA/IP
# lists are classpath resources inside the jar, the GeoIP demo dim is
# built by the Geo API, and GraftExtensions registers the native
# expressions via --conf spark.sql.extensions.
#
# Usage: scripts/deploy_smoke.sh [sfDir] [workDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
WORK=${2:-/tmp/graft_deploy_smoke}
SPARK_HOME=${SPARK_HOME:-/opt/spark}
rm -rf "$WORK"; mkdir -p "$WORK"

sbt -batch package > "$WORK/package.log" 2>&1
JAR=$(ls target/scala-2.13/irstats2spark_*.jar | head -1)

# Recommended confs for any graft spark-submit (see README):
#   spark.sql.extensions=graft.plans.GraftExtensions  native expressions
#   AQE on + initialPartitionNum ~8x cores             let AQE coalesce
#   session timezone UTC                               date semantics
SUBMIT=("$SPARK_HOME/bin/spark-submit"
  --master 'local[4]'
  --conf spark.sql.extensions=graft.plans.GraftExtensions
  --conf spark.sql.adaptive.enabled=true
  --conf spark.sql.adaptive.coalescePartitions.initialPartitionNum=32
  --conf spark.sql.shuffle.partitions=4
  --conf spark.sql.session.timeZone=UTC
  --conf spark.ui.enabled=false)

echo "== 1/3 synthesize day-file logs from $SF =="
"${SUBMIT[@]}" --class graft.LogGen "$JAR" \
  "$SF" "$WORK/logs" 1 14 2>"$WORK/loggen.err" | grep '\[loggen\]'

echo "== 2/3 ETL: day files -> fact tables =="
"${SUBMIT[@]}" --class graft.EtlCli "$JAR" \
  "$WORK/logs/day=*/*.gz" "$WORK/facts" "$WORK/ckpt" 2>"$WORK/etl.err" \
  | grep '\[etl\]' | head -5

echo "== 3/3 query: fact tables -> report JSON (cold, then cache-warm) =="
"${SUBMIT[@]}" --class graft.QueryCli "$JAR" \
  "$WORK/facts" datatype=downloads range=20y fields=date order_by=date \
  order_desc=0 cache_dir="$WORK/ir2" 2>"$WORK/query.err" \
  > "$WORK/report.json"
python3 - "$WORK/report.json" <<'EOF'
import json, sys
payload = json.load(open(sys.argv[1]))
rows = payload["data"]
assert rows, f"empty report: {payload}"
print(f"report OK: {len(rows)} rows, first = {rows[0]}")
EOF
# warm request must be file-served (the CLI prints the cached payload
# without starting a SparkContext — no new lines land in query.err)
"${SUBMIT[@]}" --class graft.QueryCli "$JAR" \
  "$WORK/facts" datatype=downloads range=20y fields=date order_by=date \
  order_desc=0 cache_dir="$WORK/ir2" 2>/dev/null > "$WORK/report2.json"
cmp -s "$WORK/report.json" "$WORK/report2.json" \
  && echo "cache-warm request byte-equal: OK" \
  || { echo "FAIL: warm request diverged"; exit 1; }
echo "DEPLOY_SMOKE_OK"
