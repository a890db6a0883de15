package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.RetentionState
import graft.streaming.RetentionState.Ev

/** A10: stateful bounded log retention via flatMapGroupsWithState. */
class StreamingRetentionSpec extends SparkSpec {

  test("insert keeps newest-N sorted and bounded") {
    val cap = 3
    val evs = Seq(5L, 1L, 9L, 3L, 7L).map(o => Ev("r", o, o * 10))
    val log = evs.foldLeft(List.empty[Ev])((acc, e) => RetentionState.insert(acc, e, cap))
    assert(log.map(_.offset) == List(9L, 7L, 5L))
  }

  test("streaming bounded log matches batch top-N per route") {
    import spark.implicits._
    val cap = 50
    val retainedQuery = "retained_" + System.nanoTime()
    val q = RetentionState.streamBoundedLog(spark, sfDir, cap)
      .writeStream.format("memory").queryName(retainedQuery)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Final retained set = last emitted generation per route: dedupe on
    // (route, offset), keep newest cap per route (append mode re-emits).
    val retained = spark.table(retainedQuery)
      .groupBy("route", "offset").agg(max("us").as("us"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("route").orderBy(col("offset").desc)
    val topRetained = retained.withColumn("rk", row_number().over(w))
      .where(col("rk") <= cap).select("route", "offset")

    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type").as("route"), col("event_id").as("offset"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= cap)
      .select("route", "offset")
    assert(topRetained.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(topRetained).count() == 0)
  }

  test("nearestOffset: forward seek with backward fallback") {
    import spark.implicits._
    val retained = Seq(
      Ev("a", 1, 100), Ev("a", 2, 200), Ev("a", 3, 300),
      Ev("b", 10, 50)).toDS()
    // since=150: route a seeks forward to offset 2; route b falls back to 10
    val res = RetentionState.nearestOffset(retained, 150).collect().toMap
    assert(res("a") == 2L)
    assert(res("b") == 10L)
  }
}
