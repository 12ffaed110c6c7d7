#!/usr/bin/env bash
# Run a graft main class on the already-compiled classpath with plain java,
# bypassing sbt entirely. Two reasons to exist:
#   - sbt serializes on a project-level build lock, so a long `sbt test`
#     blocks every `sbt runMain` — this lets verify/bench/scale sweeps run
#     while tests compile in another process;
#   - it is also the exact command a library consumer would run (jar +
#     /opt/spark/jars on the classpath), so it doubles as a smoke-test of
#     the deployment shape.
# JVM flags mirror build.sbt's javaOptions (Spark 4.x on JDK 17 needs the
# add-opens spark-submit would otherwise inject).
set -euo pipefail
MAIN=$1; shift
CLASSES=${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
FLAGS=()
for p in "${ADD_OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
