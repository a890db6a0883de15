package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. event-log surface
    "q_evt_parse" -> (EventLogOps.parse _),
    "q_evt_since" -> (EventLogOps.since _),
    "q_evt_nearest_offset" -> (EventLogOps.nearestOffset _),
    "q_evt_retention_capacity" -> ((s: SparkSession, d: String) => EventLogOps.retentionCapacity(s, d)),
    "q_evt_retention_age" -> ((s: SparkSession, d: String) => EventLogOps.retentionAge(s, d)),
    "q_evt_sse_frames" -> (EventLogOps.sseFrames _),
    "q_evt_routes" -> (EventLogOps.routes _),
    "q_evt_start_position" -> (EventLogOps.startPosition _),
    // B. relational core
    "q1_pricing_summary" -> (Relational.q1PricingSummary _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_evt_parse" -> EventLogOps.parseSql,
    "q_evt_since" -> EventLogOps.sinceSql,
    "q_evt_nearest_offset" -> EventLogOps.nearestOffsetSql,
    "q_evt_retention_capacity" -> EventLogOps.retentionCapacitySql,
    "q_evt_retention_age" -> EventLogOps.retentionAgeSql,
    "q_evt_sse_frames" -> EventLogOps.sseFramesSql,
    "q_evt_routes" -> EventLogOps.routesSql,
    "q_evt_start_position" -> EventLogOps.startPositionSql,
    "q1_pricing_summary" -> Relational.q1PricingSummarySql
  )
}
