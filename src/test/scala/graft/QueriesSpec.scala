package graft

import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Smoke + invariant coverage for every SparkEntry query at sf0.001.
  * (Value-level correctness is the driver's DuckDB oracle compare; these
  * assert structural invariants cheaply per operator.)
  */
class QueriesSpec extends SparkSpec {

  test("every registered query runs and yields rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has matching oracle SQL (or is an allowlisted rows-only op)") {
    // ops whose iterative/trained/sketch nature is not SQL-expressible
    // get the driver's weaker rows-only check; each needs its own
    // value-level gate elsewhere (ivf_trained + ann_pq: AnnRecallSpec
    // recall vs brute force; profile_approx: PipelineOpsSpec error
    // bounds vs exact)
    val rowsOnly =
      Set("q_ann_ivf_trained", "q_profile_approx", "q_ann_pq", "q_ann_ivfpq",
        "q_dedup_semantic",
        // sketch-only monitoring form: raw HLL/GK estimates are
        // engine-specific; its audit twin q_profile_approx is gated
        "from_profile_sketch")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty, "stale allowlist entry")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("retention capacity keeps exactly N newest offsets") {
    val df = graft.operators.EventLogOps.retentionCapacity(spark, sfDir, capacity = 100)
    assert(df.count() == 100)
    val ids = df.select("event_id").collect().map(_.getLong(0))
    // oracle from the RAW table: parse() drops skip-on-error rows and
    // would understate the true max if the newest event had bad props
    val maxId = Tables.eventsRaw(spark, sfDir)
      .agg(max("event_id")).collect()(0).getLong(0)
    assert(ids.max == maxId, "newest event must survive capacity retention")
    assert(ids.sorted.sameElements(ids), "output sorted by offset")
  }

  test("nearest-offset: sparse probes resolve from neighboring hours") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.eventsRaw(spark, sfDir)
      .select(col("event_id"), expr("ts DIV 1000").as("us"))
    val Seq(minUs, maxUs) = ev.agg(min("us"), max("us")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long])
    // three probes: before all data, mid-range on an arbitrary hour,
    // and after all data — none guaranteed to hit a non-empty hour
    val hourUs = 3600L * 1000000
    val probesUs = Seq(minUs - 5 * hourUs, (minUs + maxUs) / 2, maxUs + 5 * hourUs)
      .map(u => u - u % hourUs)
    val probes = probesUs.toDF("us")
      .select(timestamp_micros(col("us")).as("probe_ts"))
    val got = graft.operators.EventLogOps
      .nearestOffsetFor(spark, sfDir, probes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evs = ev.collect().map(r => (r.getLong(0), r.getLong(1)))
    probesUs.foreach { p =>
      val fwd = evs.filter(_._2 >= p).map(_._1).minOption
      val bwd = evs.filter(_._2 < p).map(_._1).maxOption
      assert(got(p) == fwd.orElse(bwd).get, s"probe $p")
    }
  }

  test("nearest-offset: forward seek else backward fallback is total") {
    val df = graft.operators.EventLogOps.nearestOffset(spark, sfDir)
    assert(df.where(col("offset_id").isNull).count() == 0,
      "every probe inside the data range must resolve")
  }

  test("sessionize: session counts sum to event count") {
    val events = Tables.eventsRaw(spark, sfDir).count()
    val sessions = graft.operators.Relational.qSessionize(spark, sfDir)
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == events)
  }

  test("topk per group: ≤3 rows per segment, rank dense from 1") {
    val df = graft.operators.Relational.qTopkPerGroup(spark, sfDir)
    val bad = df.groupBy("segment").agg(count(lit(1)).as("n"), max("rk").as("m"))
      .where(col("n") > 3 || col("m") =!= col("n"))
    assert(bad.count() == 0)
  }
}
