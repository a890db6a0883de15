package graft

import graft.sources.Tables

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  test("backward asof: inclusive match, per-key isolation, null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 100L, "r-a"), (1L, 150L, "r-b"), (3L, 10L, "r-c"))
      .toDF("k", "t", "tag")
      .withColumn("rid", monotonically_increasing_id())
    val res = AsofJoin.backward(left, right, "k", "t",
      payload = Seq("tag"), tiebreak = "rid")
      .select("name", "asof_tag").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(res("p1") == "r-a")  // equal ts matches (inclusive)
    assert(res("p2") == "r-b")  // latest earlier
    assert(res("p3") == null)   // key 2 has no right rows; key 3 isolated
  }

  test("a matched row's NULL payload is preserved, not skipped backward") {
    import spark.implicits._
    val left = Seq((1L, 15L, "p")).toDF("k", "t", "name")
    // the ts=10 row is the asof match and carries tag=NULL; an older
    // row (ts=5) has a non-null tag that must NOT leak forward
    val right = Seq((1L, 5L, Some("old"), 100L), (1L, 10L, None, 101L))
      .toDF("k", "t", "tag", "rid")
    val res = AsofJoin.backward(left, right, "k", "t",
      payload = Seq("tag", "rid"), tiebreak = "rid").collect()(0)
    assert(res.isNullAt(res.fieldIndex("asof_tag")), "stale payload leaked")
    assert(res.getLong(res.fieldIndex("asof_rid")) == 101L)
  }

  test("attribution matches a window-free per-row computation") {
    val got = AsofJoin.attribution(spark, sfDir)
      .select("event_id", "asof_click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val ev = Tables.eventsRaw(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicks = ev.filter(_._4 == "click")
    val expected = ev.filter(_._4 == "purchase").map { case (id, u, us, _) =>
      val cands = clicks.filter(c => c._2 == u && c._3 <= us)
      id -> (if (cands.isEmpty) -1L
             else cands.maxBy(c => (c._3, c._1))._1)
    }.toMap
    assert(got == expected)
  }
}
