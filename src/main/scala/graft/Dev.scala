package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main for interactive dev; not part of the contract.
  * Current probe: exact vs IVF-probed semantic-dedup assignment at
  * whatever corpus SPARK_GRAFT_SF_DIR points to. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dev] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.read.parquet(s"$dir/embeddings.parquet").count() // warmup
    for (probe <- Seq(2, 0)) {
      val label = if (probe == 0) "semanticDedup exact" else s"semanticDedup probe=$probe"
      time(label)(operators.SemanticDedup.semanticDedup(spark, dir, probeCoarse = probe)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
