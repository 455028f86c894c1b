#!/bin/bash
# Direct JVM runner for graft mains (bypasses sbt startup for profiling
# loops). Usage: tools/run_main.sh graft.Bench [args...]
# Env: SPARK_DRIVER_MEM (default 8g) plus the usual SPARK_GRAFT_* knobs.
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=${SPARK_UI_ENABLED:-false} \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
