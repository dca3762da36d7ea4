#!/bin/bash
# North-rule scaling evidence (BASELINE.md sandbox protocol): the same full
# validation job, same deterministic input, at two parallelism levels N and
# 4N, via spark-submit. Best-of-R wall-clock per level (the host is a shared
# oversubscribed VM — see BENCH.md "host capacity" — so single runs are
# noisy); CPU-time per row recorded as the noise-free work-efficiency
# signal.
#
# Usage: tools/bench_scaling.sh [N] [ROWS] [REPEATS]
set -e
N=${1:-1}
N4=$((N * 4))
ROWS=${2:-2000000}
R=${3:-3}
JAR=target/scala-2.13/cerberusspark_2.13-0.1.0.jar

sbt -batch package >/dev/null

run() { # $1=threads $2=out
  /opt/spark/bin/spark-submit --master "local[$1]" --driver-memory 16g \
    --conf spark.sql.shuffle.partitions="$1" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.adaptive.enabled=true \
    --class graft.ScalingBench "$JAR" "$ROWS" "$2" 2>/dev/null | tail -1
}

mkdir -p /tmp/graft_scaling
for i in $(seq "$R"); do
  echo "== round $i/$R"
  run "$N"  "/tmp/graft_scaling/n_${N}_r${i}.json"
  run "$N4" "/tmp/graft_scaling/n_${N4}_r${i}.json"
done

python3 tools/scaling_report.py "$N" "$N4" "$ROWS" /tmp/graft_scaling > BENCH.md
cat BENCH.md
