#!/usr/bin/env bash
# VERDICT r9 #6 — prove the library is consumable OUTSIDE the repo harness:
#   1. `sbt publishLocal` a versioned artifact into the local ivy repo;
#   2. generate a scratch sbt project (its own dir, own build) that depends
#      on the PUBLISHED artifact — not on this repo's source tree;
#   3. compile and run the README Quickstart there, end-to-end, and assert
#      the same output QuickstartSpec asserts.
# This is the first command sequence a real user runs; nothing in the round
# harness exercises it otherwise.
set -euo pipefail
cd "$(dirname "$0")/.."

VERSION=$(sed -n 's/.*ThisBuild \/ version := "\(.*\)"/\1/p' build.sbt)
# sbt's default organization is the normalized project name
ORG=$(sed -n 's/^ThisBuild \/ organization := "\(.*\)"/\1/p' build.sbt)
ORG=${ORG:-tuplexspark}
echo "== publishLocal $ORG:tuplexspark:$VERSION"
sbt -batch publishLocal >/tmp/quickstart_publish.log 2>&1 || {
  tail -20 /tmp/quickstart_publish.log; exit 1; }

SCRATCH=$(mktemp -d /tmp/graft_quickstart_proj.XXXX)
echo "== scratch project at $SCRATCH"
mkdir -p "$SCRATCH/project" "$SCRATCH/src/main/scala" "$SCRATCH/data"
cp project/build.properties "$SCRATCH/project/"
cat > "$SCRATCH/build.sbt" <<EOF
scalaVersion := "2.13.17"
// the library under test, from the local ivy repo publishLocal filled
libraryDependencies += "$ORG" %% "tuplexspark" % "$VERSION"
// Spark provided by the runtime image, exactly like a cluster deployment
unmanagedBase := file("/opt/spark/jars")
run / fork := true
outputStrategy := Some(StdoutOutput)
javaOptions ++= Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
  "java.base/java.nio", "java.base/java.util",
  "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"\$p=ALL-UNNAMED")) ++
  Seq("-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC")
EOF

cat > "$SCRATCH/data/docs.csv" <<'EOF'
doc_id,text
1,The Quick Brown Fox
2,the quick  brown fox
3,<raw>The Quick Brown Fox</raw>
4,An Entirely Different Document
EOF

# The README Quickstart, verbatim in shape (QuickstartSpec keeps README and
# code in sync; this main re-runs it against the PUBLISHED jar).
cat > "$SCRATCH/src/main/scala/Main.scala" <<'EOF'
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Context
import graft.dedup.Dedup

object Main {
  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ctx = new Context(spark)
    val docs = ctx.csv(s"$in/*.csv")
      .mapColumnUdf[String, String]("text") { t =>
        if (t.contains("<raw>")) throw new IllegalArgumentException("markup")
        t.toLowerCase
      }
      .resolve(classOf[IllegalArgumentException]) { (t: String) =>
        t.replaceAll("</?raw>", "").toLowerCase
      }
    val keepers = Dedup.contentHash(docs.toDF, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val unique = docs.toDF.join(keepers, Seq("doc_id"), "left_semi")
    ctx.fromDataFrame(unique).tocsv(out, numParts = 2)

    val back = ctx.csv(s"$out/*.csv").toDF
    val n = back.count()
    val ids = back.select("doc_id").collect().map(_.get(0).toString.toLong).sorted
    spark.stop()
    require(n == 2 && ids.sameElements(Array(1L, 4L)),
      s"quickstart wrong answer: n=$n ids=${ids.mkString(",")}")
    println(s"""{"quickstart":"ok","rows":$n,"ids":"${ids.mkString(",")}"}""")
  }
}
EOF

echo "== compile + run against the published jar"
(cd "$SCRATCH" && sbt -batch "run $SCRATCH/data $SCRATCH/out" 2>&1 \
  | tee /tmp/quickstart_run.log | tail -3)
grep -q '"quickstart":"ok"' /tmp/quickstart_run.log
echo "== OK: published artifact consumable from a scratch project"
