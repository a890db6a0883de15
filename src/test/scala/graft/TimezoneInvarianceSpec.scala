package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{EventLogOps, Maintenance, Relational}
import graft.sources.Tables

/** Session-timezone invariance: every query must answer the same rows
  * in a non-UTC consumer session as in the UTC session the oracle gate
  * runs under. Verify/Bench pin UTC, so this class of bug is invisible
  * to the driver's gate — a deployment's `America/New_York` session
  * would silently shift (a) string→timestamp boundary literals (TPC-H
  * date predicates flip midnight-aligned rows), (b) `date_trunc`/
  * `to_date`/`date_format` renderings, and (c) the NTZ-vintage events
  * read (round-11 ADVICE residual, sources/Tables.scala:141 area).
  *
  * `Asia/Kathmandu` (+05:45) is the adversarial zone: whole-hour
  * offsets (NY) cannot catch a session-zone `date_trunc('hour')`
  * because the truncation grid coincides with UTC's there.
  */
class TimezoneInvarianceSpec extends SparkSpec {

  private def inZone(zone: String)(f: SparkSession => DataFrame): Seq[String] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", zone)
    val df = f(s2)
    // canonical row text: timestamps compared as instants (collect
    // yields java.time.Instant-backed values independent of zone)
    df.collect().map(_.toString).sorted.toIndexedSeq
  }

  private def invariant(name: String)(f: SparkSession => DataFrame): Unit = {
    val utc = inZone("UTC")(f)
    assert(utc.nonEmpty, s"$name: empty UTC result proves nothing")
    for (zone <- Seq("America/New_York", "Asia/Kathmandu")) {
      val z = inZone(zone)(f)
      assert(z == utc,
        s"$name diverges in $zone: ${z.diff(utc).take(3)} vs ${utc.diff(z).take(3)}")
    }
  }

  test("TPC-H boundary literals are zone-free (q1/q3/q5)") {
    invariant("q1")(s => Relational.q1PricingSummary(s, sfDir))
    invariant("q3")(s => Relational.q3ShippingPriority(s, sfDir))
    invariant("q5")(s => Relational.q5LocalSupplier(s, sfDir))
  }

  test("event-time operators are zone-free (nearest-offset grid, tumbling window, since)") {
    invariant("q_evt_nearest_offset")(s => EventLogOps.nearestOffset(s, sfDir))
    invariant("q_tumbling_window")(s => Relational.qTumblingWindow(s, sfDir))
    invariant("q_evt_since")(s => EventLogOps.since(s, sfDir))
  }

  test("UTC-day derivations are zone-free (compaction plan, SSE frames)") {
    invariant("q_compaction_plan")(s => Maintenance.compactionPlan(s, sfDir))
    invariant("q_evt_sse_frames")(s => EventLogOps.sseFrames(s, sfDir))
  }

  test("NTZ-vintage events normalize to the same nanos in any session zone") {
    // build a tiny NTZ-typed events table: the wall clock IS the UTC
    // instant for this vintage (DuckDB's timezone-agnostic read)
    val dir = Files.createTempDirectory("graft_ntz").toFile.getPath
    val s0 = spark.newSession()
    s0.conf.set("spark.sql.session.timeZone", "UTC")
    s0.sql(
      """SELECT id AS event_id,
        |  timestampadd(SECOND, CAST(id AS INT),
        |    TIMESTAMP_NTZ '2024-01-15 00:00:00') AS ts,
        |  id % 3 AS user_id, 'click' AS event_type,
        |  CAST(id AS DOUBLE) AS value, '{}' AS props
        |FROM range(5)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expected = (0 until 5)
      .map(i => 1705276800000000000L + i * 1000000000L)
    invariant("ntz-events")(s => Tables.eventsRaw(s, dir))
    val got = Tables.eventsRaw(spark.newSession(), dir)
      .select("ts").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected, s"NTZ micros extraction shifted: $got")
  }

  test("partitioned layout writes UTC event_date directories in any session zone") {
    val src = Files.createTempDirectory("graft_tzsrc").toFile.getPath
    val out = Files.createTempDirectory("graft_tzout").toFile.getPath
    val sNy = spark.newSession()
    sNy.conf.set("spark.sql.session.timeZone", "America/New_York")
    // 2024-01-15T01:30:00Z is Jan 14 in New York — the boundary case
    sNy.sql(
      """SELECT CAST(1 AS BIGINT) AS event_id,
        |  CAST(1705282200000000000 AS BIGINT) AS ts,
        |  CAST(1 AS BIGINT) AS user_id, 'click' AS event_type,
        |  CAST(1.0 AS DOUBLE) AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$src/events.parquet")
    Tables.writeEventsPartitioned(sNy, src, out)
    val dirs = new java.io.File(s"$out/events.parquet").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs == Seq("event_date=2024-01-15"),
      s"partition key must be the UTC day, got $dirs")
  }
}
