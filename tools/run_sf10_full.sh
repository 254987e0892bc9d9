#!/bin/bash
# Full-suite sf10 endurance run (round-12 verdict #1): one reading per
# declared query at the third decade, single pass, 64g heap (the
# SCALING.md harness lesson), incremental jsonl flush.
#
# Runs from a CLASS SNAPSHOT via plain java so sbt stays free for
# development while the sweep runs (same JVM flags as build.sbt).
set -euo pipefail
cd /root/repo
SNAP=/tmp/graft_cls_r12
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP"/

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

export SPARK_GRAFT_SF_LIST=${SPARK_GRAFT_SF_LIST:-/root/repo/testdata_sf10}
export SPARK_GRAFT_SCALING_OUT=${SPARK_GRAFT_SCALING_OUT:-/root/repo/scaling_sf10_full.jsonl}
export SPARK_GRAFT_SCALING_PASSES=${SPARK_GRAFT_SCALING_PASSES:-1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}

exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-64g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" \
  graft.Scaling "$@"
