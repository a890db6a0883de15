package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventLogOps, EventLogService, Sampling}

class ServiceSpec extends SparkSpec {

  test("framesSince composes resolution + framing like the reference flow") {
    val route = "click"
    val sinceNs = 1705276800000000000L // 2024-01-15T00:00:00Z
    val got = EventLogService.framesSince(spark, sfDir, route, sinceNs)
    // resolution: first frame's offset = forward-seek result for the route
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("event_type") === route)
    val expectedStart = ev.where(col("ts") >= sinceNs)
      .agg(min("event_id")).collect()(0).getLong(0)
    assert(got.select(min("event_id")).collect()(0).getLong(0) == expectedStart)
    // framing: byte format matches the batch SSE projection
    val f = got.select("frame").head().getString(0)
    assert(f.startsWith("data: {\"time\":\"") && f.endsWith("}\n\n"))
    // completeness: every route event at/after the offset is framed
    val expectedN = ev.where(col("event_id") >= expectedStart).count()
    assert(got.count() == expectedN)
  }

  test("framesSince falls back to the largest earlier offset") {
    // since far beyond the data: no forward match -> newest event only
    val sinceNs = 4102444800000000000L // 2100-01-01
    val got = EventLogService.framesSince(spark, sfDir, "view", sinceNs)
    val maxId = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("event_type") === "view")
      .agg(max("event_id")).collect()(0).getLong(0)
    assert(got.select("event_id").collect().map(_.getLong(0)).toSeq == Seq(maxId))
  }

  test("hash sample is stable under repartitioning and roughly pct-sized") {
    val a = Sampling.hashSample(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(a.size > 0 && a.size < n / 4, s"10% sample of $n docs got ${a.size}")
    val b = Sampling.hashSample(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
