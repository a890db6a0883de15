package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** A13: streaming sessionization — session_window gap rule vs the
  * batch lag-rule (B10), and append-mode emission at the watermark. */
class StreamingSessionSpec extends SparkSpec {

  test("session_window equals the lag-rule sessionization on gap-free-boundary data") {
    // precondition for equality: session_window splits at delta >= gap,
    // the lag rule at delta > gap — the data must have no EXACT 30-min
    // inter-event delta or the comparison is vacuous-by-luck
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy("us")
    val exact = Tables.eventsRaw(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 1000").as("us"))
      .withColumn("d", col("us") - lag("us", 1).over(w))
      .where(col("d") === gapUs).count()
    assert(exact == 0, "fixture has an exact-gap pair; equality not defined")

    val viaWindow = EventStreams.sessionWindowsBatch(spark, sfDir)
      .select("user_id", "start_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLag = graft.operators.Relational.qSessionize(spark, sfDir)
      .select("user_id", "start_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaWindow.nonEmpty && viaWindow == viaLag,
      s"session_window diverges from the lag rule: ${
        (viaWindow diff viaLag).take(3)} vs ${(viaLag diff viaWindow).take(3)}")
  }

  test("append mode emits a session once the watermark closes it; open sessions hold") {
    val dir = Files.createTempDirectory("graft_sess").toFile
    try {
      import spark.implicits._
      val t0 = 1705276800000000000L // 2024-01-15T00:00:00Z, nanos
      val m = 60L * 1000000000L
      def write(rows: Seq[(Long, Long)], first: Boolean): Unit = {
        rows.map { case (id, ts) => (id, ts, 7L, "route", 1.0, """{"k": 1}""") }
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode(if (first) "overwrite" else "append")
          .parquet(dir.getPath)
        // distinct modification times: file order = processing order
        // under maxFilesPerTrigger=1
        Thread.sleep(1100)
      }
      // batch 1: one 3-event session (5-min spacing)
      write(Seq(1L -> t0, 2L -> (t0 + 5 * m), 3L -> (t0 + 10 * m)), first = true)
      // batch 2: a much later event — advances the watermark far past
      // the first session's close, and itself stays open
      write(Seq(4L -> (t0 + 600 * m)), first = false)

      val stream = spark.readStream
        .schema(graft.sources.Tables.eventsRawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getPath)
        .withColumn("ts_us", timestamp_micros(expr("ts DIV 1000")))
      val name = "sess_" + System.nanoTime()
      val q = EventStreams.sessionWindowsOf(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val got = spark.table(name)
        .select("user_id", "start_us", "end_us", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val gapUs = 30L * 60 * 1000000
      assert(got.toSeq == Seq((7L, t0 / 1000, t0 / 1000 + 10 * 60 * 1000000 + gapUs, 3L)),
        s"exactly the closed first session must emit, got ${got.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }
}
