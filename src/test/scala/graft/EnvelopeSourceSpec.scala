package graft

import org.apache.spark.sql.functions._

/** A14's "source swap, not a rewrite" claim, proven on a NON-FILE
  * unbounded source: the same [[graft.operators.EventLogOps
  * .parseEnvelopes]] transform that serves batch reads and the file
  * streaming source runs unchanged on Spark's `rate` source — a
  * continuous generator with no files behind it, standing in for the
  * reference's Kinesis consumer (kinesis2sse.go:86-126, which the
  * sandbox cannot reach). Only the `lines` argument changes.
  */
class EnvelopeSourceSpec extends SparkSpec {

  test("parseEnvelopes runs unchanged on the rate source, skip rules included") {
    // envelope-ify the rate stream's ticks: strict-RFC3339 time from a
    // FIXED instant (deterministic asserts; the tick's own wall-clock
    // timestamp is irrelevant), detail carrying the tick number —
    // except every 3rd tick, which omits "detail" and must be skipped
    // by the same rule that skips it on every other source
    val lines = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .select(
        when(col("value") % 3 === 0,
          concat(lit("{\"time\":\"2024-01-15T00:00:"),
            lpad((col("value") % 60).cast("string"), 2, "0"),
            lit("Z\"}")))
          .otherwise(
            concat(lit("{\"time\":\"2024-01-15T00:00:"),
              lpad((col("value") % 60).cast("string"), 2, "0"),
              lit("Z\",\"detail\":{\"n\":"), col("value"), lit("}}")))
          .as("value"))
    val name = "rate_env_" + System.nanoTime()
    val q = graft.operators.EventLogOps.parseEnvelopes(lines)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000L
      while (spark.table(name).count() < 10 &&
             System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length >= 10, s"rate-source ingest produced ${rows.length} rows")
      val DetailRe = """\{"n":(\d+)\}""".r
      val ns = rows.map {
        case (_, DetailRe(n)) => n.toLong
        case (_, d) => fail(s"unexpected detail payload from rate ingest: $d")
      }
      assert(ns.forall(_ % 3 != 0), "a detail-less envelope slipped through the skip rule")
      // the RFC3339 gate parsed the constructed instants (all within
      // the fixed minute)
      assert(rows.forall { case (ts, _) =>
        ts >= 1705276800000000L && ts < 1705276860000000L
      }, "timestamps outside the constructed RFC3339 minute")
    } finally q.stop()
  }
}
