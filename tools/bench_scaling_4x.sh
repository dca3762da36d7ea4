#!/bin/bash
# 4x-input campaigns (BENCH.md "input-scale invariance" sections): the same
# narrow/wide jobs as tools/bench_scaling.sh but at 4x the rows — 8M narrow,
# 600k wide — at local[N] vs local[4N], R rounds, runs paired back-to-back
# within each round so the wall comparison shares a host-grant window.
# Assumes the jar is already built (run after bench_scaling.sh).
#
# Usage: tools/bench_scaling_4x.sh [N] [REPEATS] [OUTDIR]
set -e
set -o pipefail
N=${1:-1}
N4=$((N * 4))
R=${2:-3}
OUT=${3:-/tmp/graft_scaling_r4_4x}
JAR=target/scala-2.13/cerberusspark_2.13-0.1.0.jar

run() { # $1=threads $2=rows $3=pad $4=out
  EXTRA=""
  if [ "$3" != "0" ]; then
    EXTRA="--conf spark.sql.files.maxPartitionBytes=16m"
  fi
  /opt/spark/bin/spark-submit --master "local[$1]" --driver-memory 20g \
    --conf spark.sql.shuffle.partitions="$1" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.adaptive.enabled=true \
    $EXTRA \
    --class graft.ScalingBench "$JAR" "$2" "$4" "$3" parquet 2>"$4.err" | tail -1
  [ -s "$4" ] || { echo "RUN FAILED, stderr follows:"; cat "$4.err"; exit 1; }
  cat "$4"; echo
}

mkdir -p "$OUT"
for i in $(seq "$R"); do
  TS=$(date +%s)
  echo "== 4x round $i/$R (ts=$TS)"
  run "$N"  8000000 0      "$OUT/narrow8m_n${N}_r${TS}.json"
  run "$N4" 8000000 0      "$OUT/narrow8m_n${N4}_r${TS}.json"
  run "$N"  600000  16384  "$OUT/wide600k_n${N}_r${TS}.json"
  run "$N4" 600000  16384  "$OUT/wide600k_n${N4}_r${TS}.json"
done
echo "done; summarize with: python3 tools/scaling_4x_report.py $N $N4 $OUT"
