package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** J4: log compaction — latest-wins current state per key, the
  * Kafka-compacted-topic / CDC-snapshot read of an event log: for each
  * user, the single most recent valid event wins and everything older
  * is superseded. The event-log complement of A4/A5's retention
  * (which bound the log by count/age; compaction bounds it by KEY).
  *
  * Validity follows the reference's processor rules
  * (record_processor.go:52-101): rows without a timestamp or key
  * never become state. Latest is (ts, event_id) lexicographic — ts
  * first, the unique event_id as the deterministic tiebreak, so the
  * compacted state is engine- and partitioning-independent.
  *
  * Scale shape: `row_number() = 1` over (user_id | ts desc, event_id
  * desc) rewrites to WindowGroupLimit (PlanSpec pins it) — each map
  * task forwards at most ONE candidate row per key to the exchange,
  * so the shuffle moves O(keys · tasks) winner candidates, not the
  * full log; at 100 TB the exchange carries the key space, not the
  * event history. No join, no driver state.
  */
object Compaction {

  def compactLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.eventsRaw(spark, dir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  val compactLatestSql: String =
    """SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS ts_us,
      |  event_type AS last_type, value AS last_value
      |FROM (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin
}
