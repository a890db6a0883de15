package graft

import graft.sources.Tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: clicks attributed to purchases within
  * a trailing window, both sides watermarked — the streaming form of
  * the batch as-of/attribution operators. State is bounded by the
  * watermark + interval condition.
  */
class StreamingJoinSpec extends SparkSpec {

  test("stream-stream interval join matches the batch equivalent") {
    val ev = graft.streaming.EventStreams.readEvents(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
    val name = "sjoin_" + System.nanoTime()
    val q = joined.select("p_id", "c_id").writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val bev = Tables.eventsRaw(spark, sfDir)
      .withColumn("us", expr("ts DIV 1000"))
    val bp = bev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("us").as("p_us"))
    val bc = bev.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("us").as("c_us"))
    val batch = bp.join(bc,
      expr("p_user = c_user AND c_us >= p_us - 3600000000 AND c_us <= p_us"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "test data must produce attributable pairs")
    assert(streamed == batch)
  }
}
