#!/usr/bin/env bash
# Run a graft main directly on the compiled classes — no sbt lock, so a
# long bench can run while sbt compiles/tests. Mirrors build.sbt's forked
# javaOptions (JDK17 add-opens, UTC, spark.local.dir outside /tmp).
#   tools/run_main.sh [-Xmx12g] graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="${SPARK_DRIVER_MEM:-8g}"
if [[ "${1:-}" == -Xmx* ]]; then XMX="${1#-Xmx}"; shift; fi
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.local.dir=/root/repo/target/sparktmp \
  "-Xmx$XMX" "$@"
