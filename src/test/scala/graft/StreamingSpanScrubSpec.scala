package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.SpanDedup

/** T3: streaming span-level decontamination — a real two-file
  * AvailableNow stream scrubbed per micro-batch must emit exactly the
  * batch scrub of the same documents. */
class StreamingSpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private def docRows(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src1"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")

  test("T3 streamed scrub emissions equal the batch scrub") {
    val root = Files.createTempDirectory("graft_sscrub").toFile
    val streamDir = s"$root/stream"
    try {
      val kd = SpanDedup.DecontamK
      val evalItem = toks(kd + 4, "ev")
      val bench = Seq((100L, evalItem)).toDF("doc_id", "text")

      // two files -> two micro-batches; one contaminated doc per file
      val fileA = Seq(
        1L -> s"${toks(6, "pre")} $evalItem ${toks(6, "post")}",
        2L -> toks(20, "clean"))
      val fileB = Seq(
        3L -> s"$evalItem",
        4L -> toks(12, "other"))
      docRows(fileA).coalesce(1).write.parquet(streamDir)
      docRows(fileB).coalesce(1).write.mode("append").parquet(streamDir)

      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, String)]
      val q = graft.streaming.DocStreams
        .spanScrubForeachBatch(spark, streamDir, bench) { (df, _) =>
          val rows = df.collect().map(r => (
            r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
            r.getAs[Long]("contam_tokens"), r.getAs[String]("clean_text")))
          got.synchronized { got ++= rows }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val expect = SpanDedup
        .spanDecontaminateFrom(spark, docRows(fileA ++ fileB), bench)
        .collect().map(r => (
          r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("contam_tokens"), r.getAs[String]("clean_text")))
        .toSet
      assert(expect.exists(_._2 > 0), "fixture must contaminate something")
      assert(got.toSet == expect,
        s"stream diverges: only-stream=${got.toSet -- expect} " +
          s"only-batch=${expect -- got.toSet}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }
}
