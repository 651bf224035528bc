#!/bin/bash
# Launch a graft main (Verify/Bench) with plain java against the classes
# sbt already compiled, so long verification runs don't contend with the
# interactive sbt session for the project lock.
# Usage: tools/runjava.sh graft.Verify <sfDir> <outDir> [filter]
set -e
# GRAFT_CLASSES overrides the classes dir — snapshot it (cp -r) before a
# long sweep so concurrent sbt recompiles can't swap class files under
# the running JVM (silent death observed round 9).
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
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
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
