#!/bin/bash
# Standalone ScaleBench runner (the bench_run.sh pattern): snapshots the
# compiled classes so sbt stays free for compiles while a scale phase
# runs, then drives graft.ScaleBench with the same JVM shape as the sbt
# fork. All SPARK_GRAFT_* env vars pass through (SCALE_PHASE, SCALE_DIR,
# SCALE_DOCS/_EMB/_HOT, SCALE_NAMES, SERVE_REQS, STREAM_BATCHES, ...).
set -euo pipefail
SNAP=${BENCH_SNAP:-/tmp/graft_scale_classes}
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
  -cp "$SNAP:/opt/spark/jars/*" graft.ScaleBench
