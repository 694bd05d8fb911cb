#!/bin/bash
# Round-15 drift-isolation protocol (verdict task 1). Four EXCLUSIVE
# bench runs, sequential, nothing else on the box:
#   A2  full suite, 100-entry codegen cache -> /tmp/bench_A2.json
#   B   full suite, codegen cache 10000    -> /tmp/bench_B.json
#   S71 judged-71 surface, isolated JVM    -> /tmp/bench_S71.json
#   S71B judged-71, codegen cache 10000    -> /tmp/bench_S71B.json
# Comparisons: S71 vs the same 71 inside A2 separates suite-level JVM
# pressure from per-plan cost; B vs A2 prices the Janino-cache thrash
# the instrumented run exposed (16935 compiles x 14.5 ms mean).
#
# NOTE (round-16, advice fix): GraftSession now DEFAULTS the codegen
# cache to 10000, so the A2/S71 legs pin maxEntries=100 explicitly —
# the pre-fix regime this protocol prices. Rerunning the script today
# reproduces the original comparison; without the explicit pin, A2
# would silently equal B and the probe would measure nothing.
set -euo pipefail
cd /root/repo
Q71=$(cat /tmp/q71.txt)
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export BENCH_SNAP=/tmp/bench_classes_probe

BENCH_RESNAP=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_A2.json \
  SPARK_GRAFT_JAVA_OPTS="-Dspark.sql.codegen.cache.maxEntries=100" \
  tools/bench_run.sh > /tmp/bench_A2.out 2>/tmp/bench_A2.err
BENCH_RESNAP=0 SPARK_GRAFT_BENCH_OUT=/tmp/bench_B.json \
  SPARK_GRAFT_JAVA_OPTS="-Dspark.sql.codegen.cache.maxEntries=10000" \
  tools/bench_run.sh > /tmp/bench_B.out 2>/tmp/bench_B.err
BENCH_RESNAP=0 SPARK_GRAFT_BENCH_OUT=/tmp/bench_S71.json \
  SPARK_GRAFT_BENCH_NAMES="$Q71" \
  SPARK_GRAFT_JAVA_OPTS="-Dspark.sql.codegen.cache.maxEntries=100" \
  tools/bench_run.sh > /tmp/bench_S71.out 2>/tmp/bench_S71.err
BENCH_RESNAP=0 SPARK_GRAFT_BENCH_OUT=/tmp/bench_S71B.json \
  SPARK_GRAFT_BENCH_NAMES="$Q71" \
  SPARK_GRAFT_JAVA_OPTS="-Dspark.sql.codegen.cache.maxEntries=10000" \
  tools/bench_run.sh > /tmp/bench_S71B.out 2>/tmp/bench_S71B.err
echo DONE
