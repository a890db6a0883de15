package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe main for interactive dev; not part of the contract.
  * Current probe (round 14): the per-gram flag-projection pathology —
  * prices the R5/R1 fit shapes at the given corpus. A fit written as
  * `select(flag_expr, explode(grams))` evaluates flag_expr per GRAM
  * row (the projection sits above the Generate); the shipped
  * operators use the two-branch form instead (see BASELINE.md,
  * round 14). Kept as the reproduction harness. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val docs = graft.sources.Tables.parallelized(spark,
      graft.sources.Tables.documents(spark, dir))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dev] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val flagged = docs.where(length(col("text")) >= 3)
      .select(col("doc_id"),
        (graft.operators.TextAnalysis.qualityScore(col("text")) >=
          graft.operators.Dsir.TargetBand).as("is_target"),
        explode(expr(
          "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
          .as("g"))
    time("fit_flag_through_explode (pathological)") {
      flagged.groupBy("g")
        .agg(count(lit(1)).as("c3_r"),
          sum(when(col("is_target"), 1L).otherwise(0L)).as("c3_t"))
        .write.mode("overwrite").format("noop").save()
    }
    time("fit_two_branch (shipped shape)") {
      graft.operators.CharLm.excessLossSelect(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
