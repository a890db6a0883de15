package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact-dedup: the ingest-side "drop repeats" step of a
  * training-data pipeline, on the event stream.
  *
  * dropDuplicatesWithinWatermark is the state-bounded form: entries
  * are evicted once the watermark passes them, so a continuous
  * deployment holds state only for the watermark window (duplicates
  * separated by more than the delay may re-emit — at-least-once
  * dedup). Plain dropDuplicates("user_id") with a non-key watermark
  * column would keep one state entry per user FOREVER.
  */
class StreamingDedupSpec extends SparkSpec {

  test("streaming dedup keeps one event per user with bounded state") {
    val name = "sdedup_" + System.nanoTime()
    val q = graft.streaming.EventStreams.readEvents(spark, sfDir)
      .withWatermark("ts_us", "30 days")
      .dropDuplicatesWithinWatermark("user_id")
      .select("event_id", "user_id")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name)
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(got.count() == users, "exactly one event per user")
    // each kept event must belong to its user
    val bad = got.groupBy("user_id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count()
    assert(bad == 0)
  }
}
