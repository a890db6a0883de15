package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main for interactive dev; not part of the contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dev] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").count()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def g(n: Int) =
      expr(s"transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
        s"i -> concat_ws(' ', slice(split(text, ' '), i, $n)))")
    time("build g3 only")(docs.select(col("doc_id"), g(3).as("g3"))
      .write.mode("overwrite").format("noop").save())
    time("g3 + distinct size")(docs.select(col("doc_id"),
      size(g(3)).as("t"), size(array_distinct(g(3))).as("d"))
      .write.mode("overwrite").format("noop").save())
    time("full repetition")(operators.TextAnalysis.repetition(spark, dir)
      .write.mode("overwrite").format("noop").save())
    operators.TextAnalysis.repetition(spark, dir).explain("formatted")
    spark.stop()
  }
}
