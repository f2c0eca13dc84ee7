#!/bin/bash
# Run a graft main OUTSIDE sbt (background-friendly: no sbt target lock,
# so a long bench can run while sbt compiles/tests other code).
# Usage: dev/run_tool.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_* as usual.
# Mirrors build.sbt's fork javaOptions (JDK17 add-opens, code cache).
set -euo pipefail
cd "$(dirname "$0")/.."
CLASS=$1; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -XX:ReservedCodeCacheSize=1g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$CLASS" "$@"
