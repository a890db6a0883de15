#!/usr/bin/env bash
# Consumer-side build proof: compile and run scripts/QuickStart.scala
# against the `sbt publishLocal` artifact + the Spark distribution
# jars, with NO sbt in the loop — the exact classpath a downstream
# project's build tool would assemble. Run `sbt publishLocal` first.
set -euo pipefail
cd "$(dirname "$0")/.."

SCALA_VER=2.13.17
CACHE=$(find "$HOME/.cache/coursier" -name "scala-compiler-$SCALA_VER.jar" | head -1)
[ -n "$CACHE" ] || { echo "scala-compiler $SCALA_VER not in coursier cache" >&2; exit 1; }
SCALA_LIB=$(find "$HOME/.cache/coursier" -name "scala-library-$SCALA_VER.jar" | head -1)
SCALA_REFLECT=$(find "$HOME/.cache/coursier" -name "scala-reflect-$SCALA_VER.jar" | head -1)

# newest publishLocal artifact (mtime order) — `find | head -1` picked
# an arbitrary, possibly stale version when several versions coexist
GRAFT_JAR=$(find "$HOME/.ivy2/local" -name "kinesis2ssespark_2.13*.jar" -path "*/jars/*" \
  -printf '%T@ %p\n' | sort -rn | head -1 | cut -d' ' -f2-)
[ -n "$GRAFT_JAR" ] || { echo "run 'sbt publishLocal' first (no jar in ~/.ivy2/local)" >&2; exit 1; }
echo "[quickstart.sh] using artifact: $GRAFT_JAR"

SPARK_CP="/opt/spark/jars/*"
OUT=$(mktemp -d /tmp/graft_quickstart.XXXX)
trap 'rm -rf "$OUT"' EXIT

echo "[quickstart.sh] compiling QuickStart.scala against $GRAFT_JAR"
java -cp "$CACHE:$SCALA_LIB:$SCALA_REFLECT" scala.tools.nsc.Main \
  -classpath "$GRAFT_JAR:$SPARK_CP" -d "$OUT" scripts/QuickStart.scala

# the JDK17 --add-opens set Spark needs outside spark-submit (matches
# build.sbt / org.apache.spark.launcher.JavaModuleOptions)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "[quickstart.sh] running"
# shellcheck disable=SC2086
java $ADD_OPENS -Xmx4g \
  -cp "$OUT:$GRAFT_JAR:$SCALA_LIB:$SCALA_REFLECT:$SPARK_CP" \
  QuickStart "${1:-/root/testdata/sf0.001}"
