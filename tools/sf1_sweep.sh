#!/bin/bash
# Full-board sf1.0 correctness sweep: engine dump then DuckDB oracle mirror.
# Sequential so Spark and DuckDB never share the box's memory.
set -uo pipefail
SF_DIR=${1:-/tmp/sf1.0}
OUT=${2:-/tmp/verify_sf1}
LOG=${3:-/tmp/sf1_sweep.log}
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED \
 --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
 --add-opens=java.base/java.io=ALL-UNNAMED \
 --add-opens=java.base/java.net=ALL-UNNAMED \
 --add-opens=java.base/java.nio=ALL-UNNAMED \
 --add-opens=java.base/java.util=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens=java.base/sun.security.action=ALL-UNNAMED \
 --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
echo "=== Verify @ $SF_DIR -> $OUT $(date -u +%H:%M:%S) ===" >"$LOG"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} java $JOPTS -Xmx80g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT" 2>&1 \
  | grep -E "^\[verify\]" >>"$LOG"
echo "=== Verify done $(date -u +%H:%M:%S); oracle mirror ===" >>"$LOG"
GRAFT_DUCKDB_MEMLIMIT=${GRAFT_DUCKDB_MEMLIMIT:-60GB} \
  python3 tools/check_oracle.py "$SF_DIR" "$OUT" ${ORACLE_ARGS:-} >>"$LOG" 2>&1
echo "=== sweep done $(date -u +%H:%M:%S) ===" >>"$LOG"
