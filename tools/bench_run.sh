#!/bin/bash
# Standalone Bench runner: snapshots the compiled classes so sbt stays
# free for compiles while a bench runs, then drives graft.Bench with the
# same JVM shape as the sbt fork (add-opens, UTC, 16g) plus any extra
# flags in $SPARK_GRAFT_JAVA_OPTS. All SPARK_GRAFT_* env vars pass
# through (SF_DIR, CPUS, BENCH_PASSES, BENCH_NAMES, BENCH_FEATURES,
# BENCH_OUT, BENCH_LOADGATE...).
set -euo pipefail
SNAP=${BENCH_SNAP:-/tmp/graft_bench_classes}
if [ "${BENCH_RESNAP:-1}" = "1" ]; then
  rm -rf "$SNAP"
  cp -r /root/repo/target/scala-2.13/classes "$SNAP"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench
