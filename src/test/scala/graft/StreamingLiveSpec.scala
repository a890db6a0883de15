package graft

import graft.sources.Tables

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, SseSink}

/** Serving-tail behaviors the batch oracles can't cover:
  *  - live-tail SSE: catch-up then STAY ATTACHED, flushing events that
  *    arrive after the stream started (the reference handler's actual
  *    serving mode, service.go:252-283);
  *  - restart-resume: an explicit checkpoint lets a stopped query
  *    restart without reprocessing or duplicating output;
  *  - watermark/append windowCounts: the bounded-state continuous
  *    variant emits exactly the windows the watermark has closed.
  */
class StreamingLiveSpec extends SparkSpec {

  /** Tiny deterministic events table written under `dst` with the
    * production schema (ts = nanos-since-epoch BIGINT). */
  private def writeEvents(dst: File, ids: Range, append: Boolean): Unit = {
    import spark.implicits._
    val rows = ids.map { i =>
      (i.toLong, 1705276800000000000L + i.toLong * 1000000000L, i.toLong % 7,
        if (i % 2 == 0) "click" else "view", i * 1.5, s"""{"k":"$i"}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode(if (append) "append" else "overwrite").parquet(dst.getPath)
  }

  private def eventually(timeoutMs: Long = 60000L)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(200)
    }
    cond
  }

  test("live-tail SSE: frames arriving after start are flushed to the transport") {
    val base = Files.createTempDirectory("graft_live").toFile
    val evDir = new File(base, "events.parquet")
    writeEvents(evDir, 1 to 5, append = false)
    val runId = "live_" + System.nanoTime()
    val q = SseSink.serveLive(spark, base.getPath, new SseSink.InMemory(runId))
    try {
      // catch-up: everything present at start is served
      assert(eventually()(SseSink.InMemoryTransport.frames(runId).size >= 5),
        "catch-up frames never arrived")
      // follow: a file landing AFTER the query started is picked up by
      // the same continuous query — no restart involved
      writeEvents(evDir, 6 to 8, append = true)
      assert(eventually()(SseSink.InMemoryTransport.frames(runId).size >= 8),
        "tail frames never arrived")
    } finally {
      q.stop()
      SseSink.InMemoryTransport.clear(runId)
    }
    // the served bytes equal the batch SSE projection over the final table
    val runId2 = "live2_" + System.nanoTime()
    SseSink.serve(spark, base.getPath, new SseSink.InMemory(runId2))
    val batch = graft.operators.EventLogOps.sseFrames(spark, base.getPath)
      .select("frame").collect().map(_.getString(0)).toSet
    assert(SseSink.InMemoryTransport.frames(runId2).toSet == batch)
    SseSink.InMemoryTransport.clear(runId2)
  }

  test("concurrent live-tail clients each replay exactly their own since window") {
    val base = Files.createTempDirectory("graft_multi").toFile
    val evDir = new File(base, "events.parquet")
    writeEvents(evDir, 1 to 10, append = false)
    val t0 = 1705276800000000000L
    def has(frames: Seq[String], i: Int): Boolean =
      frames.exists(_.contains(s""""k":"$i""""))
    val idA = "cliA_" + System.nanoTime()
    val idB = "cliB_" + System.nanoTime()
    // client A resumes from the beginning; client B from event 6 — the
    // reference's per-handler seek (service.go:244-262), realized as
    // one continuous query per subscription with its own pushed filter
    val qA = SseSink.serveLive(spark, base.getPath, new SseSink.InMemory(idA),
      sinceNs = Some(t0))
    val qB = SseSink.serveLive(spark, base.getPath, new SseSink.InMemory(idB),
      sinceNs = Some(t0 + 6L * 1000000000L))
    try {
      assert(eventually()(SseSink.InMemoryTransport.frames(idA).size >= 10),
        "client A catch-up incomplete")
      assert(eventually()(SseSink.InMemoryTransport.frames(idB).size >= 5),
        "client B catch-up incomplete")
      // both clients share the live tail
      writeEvents(evDir, 11 to 12, append = true)
      assert(eventually()(SseSink.InMemoryTransport.frames(idA).size >= 12),
        "client A tail frames never arrived")
      assert(eventually()(SseSink.InMemoryTransport.frames(idB).size >= 7),
        "client B tail frames never arrived")
      val fA = SseSink.InMemoryTransport.frames(idA)
      val fB = SseSink.InMemoryTransport.frames(idB)
      // exact windows: A = 1..12, B = 6..12 — and B must NOT have
      // replayed anything before its own seek position
      (1 to 12).foreach(i => assert(has(fA, i), s"client A missing event $i"))
      (6 to 12).foreach(i => assert(has(fB, i), s"client B missing event $i"))
      (1 to 5).foreach(i => assert(!has(fB, i),
        s"client B replayed event $i from before its since position"))
      assert(fA.size == 12 && fB.size == 7, s"duplicate frames: A=${fA.size} B=${fB.size}")
    } finally {
      qA.stop(); qB.stop()
      SseSink.InMemoryTransport.clear(idA)
      SseSink.InMemoryTransport.clear(idB)
    }
  }

  test("explicit checkpoint: restart resumes without reprocessing or duplicates") {
    val base = Files.createTempDirectory("graft_resume").toFile
    val evDir = new File(base, "events.parquet")
    val out = new File(base, "out").getPath
    val ckpt = new File(base, "ckpt").getPath
    def runToCompletion(): Unit = {
      val q = EventStreams.readEvents(spark, base.getPath)
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeEvents(evDir, 1 to 5, append = false)
    runToCompletion()
    assert(spark.read.parquet(out).count() == 5)
    // stop/restart across new data: the checkpoint must skip files the
    // first run already committed
    writeEvents(evDir, 6 to 8, append = true)
    runToCompletion()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 8L), s"resume reprocessed or dropped rows: $ids")
  }

  test("append-mode windowCounts emits exactly the watermark-closed windows") {
    // the closed-window assertion depends on Spark running a no-data
    // micro-batch after the last data batch to finalize the watermark;
    // pin the conf (default true) so the test encodes only semantics
    // it controls
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val complete = EventStreams.windowCounts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val emitted = EventStreams.windowCountsAppend(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // every emitted window must carry the exact complete-mode values
    emitted.foreach { case (k, v) =>
      assert(complete.get(k).contains(v), s"window $k diverges from batch answer")
    }
    assert(emitted.nonEmpty, "append mode emitted nothing")
    // the only windows missing are those the final watermark
    // (max event time - 1h delay) had not closed at end of input
    val maxUs = Tables.eventsRaw(spark, sfDir)
      .agg(expr("max(ts DIV 1000)")).collect()(0).getLong(0)
    val wmUs = maxUs - 3600L * 1000000L
    val missing = complete.keySet -- emitted.keySet
    missing.foreach { case (startUs, route) =>
      assert(startUs + 3600L * 1000000L > wmUs,
        s"closed window ($startUs, $route) was not emitted")
    }
  }
}
