package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact-dedup: the ingest-side "drop repeats" step of a
  * training-data pipeline, on the event stream (dropDuplicates with
  * state; watermark bounds state growth in continuous deployments).
  */
class StreamingDedupSpec extends SparkSpec {

  test("streaming dropDuplicates on user keeps first event per user") {
    val name = "sdedup_" + System.nanoTime()
    val q = graft.streaming.EventStreams.readEvents(spark, sfDir)
      .withWatermark("ts_us", "30 days")
      .dropDuplicates("user_id")
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
