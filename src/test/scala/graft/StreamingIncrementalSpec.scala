package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** H9: stream-static incremental dedup — incoming docs are flagged
  * against the existing corpus' band index as they arrive, including
  * docs that arrive AFTER the query starts. */
class StreamingIncrementalSpec extends SparkSpec {

  test("streaming docs match the static corpus index; fresh docs don't") {
    val root = Files.createTempDirectory("graft_sinc").toFile
    val corpusDir = s"$root/corpus"
    val streamDir = s"$root/stream"
    try {
      import spark.implicits._
      def docs(rows: Seq[(Long, String)]) =
        rows.map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
      val dupText = (0 until 12).map(t => s"d$t").mkString(" ")
      val lateText = (0 until 12).map(t => s"l$t").mkString(" ")
      val freshText = (0 until 12).map(t => s"f$t").mkString(" ")
      // static corpus: the dup source (100) and the late-arrival
      // source (101)
      docs(Seq(100L -> dupText, 101L -> lateText))
        .coalesce(1).write.parquet(s"$corpusDir/documents.parquet")
      // first batch of arrivals: one corpus copy, one fresh doc
      docs(Seq(1L -> dupText, 2L -> freshText))
        .coalesce(1).write.parquet(streamDir)

      // the long-running-query pattern the API documents: build the
      // static index ONCE, persist it with a handle, reuse it across
      // triggers, unpersist when done
      val index = graft.streaming.DocStreams.corpusBandIndex(spark, corpusDir)
        .persist()
      val name = "sinc_" + System.nanoTime()
      def run(): Unit = {
        val q = graft.streaming.DocStreams
          .incrementalMatches(spark, streamDir, index)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      val first = spark.table(name).select("doc_id", "old_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(first == Set((1L, 100L)),
        s"expected exactly the planted corpus collision, got $first")

      // a later arrival (new file in the watched directory) matches on
      // the next trigger — same query name accumulates in the sink
      docs(Seq(3L -> lateText)).coalesce(1)
        .write.mode("append").parquet(streamDir)
      run()
      val all = spark.table(name).select("doc_id", "old_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all == Set((1L, 100L), (3L, 101L)),
        s"late arrival must match the static index, got $all")
      index.unpersist()
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }
}
