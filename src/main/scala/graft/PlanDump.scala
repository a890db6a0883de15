package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the named queries to
  * plans/<tag>/<query>_<phase>.txt — the optimization-round evidence
  * files (the judge checks plan claims against these).
  *
  *   sbt "runMain graft.PlanDump r21 before q_foo q_bar"
  *
  * Session config mirrors Bench (local[32], shuffle=32, AQE on) so the
  * dumped initial plans match what the bench executes at sf0.1 —
  * unlike Plans.scala, which pins local[4] for the PLANS.md archive. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <phase> <query>...")
    val (tag, phase, names) = (args(0), args(1), args.drop(2).toSeq)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.operators.OracleContext.dir.set(dir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$phase.txt"), plan)
      println(s"wrote plans/$tag/${name}_$phase.txt")
    }
    spark.stop()
  }
}
