#!/bin/bash
# Launch any graft dev main outside sbt. Usage: tools/run.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (-Xmx), plus whatever the main itself reads.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
# SPARK_EXTRA_JAVA_OPTS: additional -Dspark.* confs (SparkConf loads
# spark.* system properties), e.g. -Dspark.io.compression.codec=zstd
exec java -Xmx${SPARK_DRIVER_MEM:-8g} $OPENS ${SPARK_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "graft.$MAIN" "$@"
