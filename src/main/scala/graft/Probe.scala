package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    // warmup
    graft.sources.Tables.embeddings(spark, dir).write.mode("overwrite").format("noop").save()

    // 1. just the scan
    time("scan") {
      graft.sources.Tables.embeddings(spark, dir).write.mode("overwrite").format("noop").save()
    }
    // 2. full operator
    time("embeddingNearDup") {
      graft.operators.Dedup.embeddingNearDup(spark, dir).write.mode("overwrite").format("noop").save()
    }
    // 3. sketch projection only (same shape as the operator's first stage)
    val signs = Array.tabulate(2 * 16, 64)((j, i) => graft.operators.Dedup.srpSign(j, i))
    def dotExpr(j: Int) = (0 until 64).map(i =>
      s"CAST(embedding[$i] AS DOUBLE) * ${signs(j)(i)}").mkString(" + ")
    def sketchExpr(s: Int) = (0 until 16).map(j =>
      s"(CASE WHEN ${dotExpr(s * 16 + j)} > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")
    time("sketch-only") {
      graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), expr(sketchExpr(0)).as("sk0"), expr(sketchExpr(1)).as("sk1"))
        .write.mode("overwrite").format("noop").save()
    }
    time("sketch+emb-carried") {
      graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"), expr(sketchExpr(0)).as("sk0"), expr(sketchExpr(1)).as("sk1"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
