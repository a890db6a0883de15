package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe main for interactive dev; not part of the contract.
  * Current probe (round 12): the P3 two-level materialization rank
  * under a PLANTED 90%-mass source — the exact pathology the round-11
  * verdict flagged (a full-source row_number window puts a dominant
  * crawl source in one task). Times mixUnimaxFrom at the given corpus
  * on (a) the natural uniform source mix and (b) a remapped mix where
  * ~90% of docs share one source; the two-level rank should price both
  * the same (the straddling bucket is ~n_s/256 regardless of skew),
  * where the old single-window shape degrades toward a one-task sort
  * of 90% of the corpus. Numbers land in BASELINE.md. */
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source")
    val skewed = docs.withColumn("source",
      when(pmod(xxhash64(col("doc_id")), lit(10)) < 9, lit("crawl"))
        .otherwise(col("source")))
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[dev] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    try {
      println(s"[dev] corpus: ${docs.count()} docs at $dir")
      time("unimax_uniform")(operators.Sampling.mixUnimaxFrom(docs))
      time("unimax_skew90")(operators.Sampling.mixUnimaxFrom(skewed))
      // second rep each: steady-state (codegen/footers warm)
      time("unimax_uniform_rep2")(operators.Sampling.mixUnimaxFrom(docs))
      time("unimax_skew90_rep2")(operators.Sampling.mixUnimaxFrom(skewed))
    } finally spark.stop()
  }
}
