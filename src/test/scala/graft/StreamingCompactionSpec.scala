package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CompactionState
import graft.streaming.CompactionState.Rec

/** K3: streaming latest-wins compaction (J4's live twin). */
class StreamingCompactionSpec extends SparkSpec {

  test("newer is the (us, event_id) lexicographic order; reduce is order-free") {
    val rs = Seq(Rec(1, 5, 500, "a", 1.0), Rec(1, 3, 700, "b", 2.0),
      Rec(1, 9, 700, "c", 3.0), Rec(1, 8, 100, "d", 4.0))
    val best = rs.reduce((a, b) => if (CompactionState.newer(a, b)) a else b)
    assert(best.event_id == 9, "ties on us break by event_id")
    rs.permutations.take(12).foreach { p =>
      val b = p.reduce((a, b) => if (CompactionState.newer(a, b)) a else b)
      assert(b == best, "winner must not depend on arrival order")
    }
  }

  test("streaming compaction equals batch compactLatest on the fixture") {
    import spark.implicits._
    val name = "comp_" + System.nanoTime()
    val q = CompactionState.streamCompacted(spark, sfDir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // final state per key = the (us, event_id) max across emissions
    val streamed = spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("last_event_id"))
    val batch = graft.operators.Compaction.compactLatest(spark, sfDir)
      .select("user_id", "last_event_id")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0, "fixture compaction is empty — test is vacuous")
  }

  test("a late OLDER event emits nothing; a newer one re-emits; state is one rec per key") {
    val dir = Files.createTempDirectory("graft_comp").toFile
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
      write(Seq(5L -> (t0 + 5 * m)), first = true) // batch 1: winner ev5
      write(Seq(3L -> t0), first = false)          // batch 2: OLDER — silent
      write(Seq(7L -> (t0 + 9 * m)), first = false) // batch 3: newer — re-emit

      val stream = spark.readStream
        .schema(graft.sources.Tables.eventsRawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getPath)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"),
          col("event_type"), col("value"))
        .as[Rec]
      val name = "complate_" + System.nanoTime()
      val q = CompactionState.compacted(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val emitted = spark.table(name).select("event_id").collect()
        .map(_.getLong(0)).toSeq.sorted
      assert(emitted == Seq(5L, 7L),
        s"want emissions exactly [5, 7] (old ev3 silent), got $emitted")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }
}
