package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

/** Bucketed co-located joins: the write-once/join-free contract. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val (bl, bo) = Bucketing.coLocate(spark,
      li, "li_bucketed", "l_orderkey",
      ord, "ord_bucketed", "o_orderkey", buckets = 8)

    // force the sort-merge path (at this SF both sides are broadcast-
    // size, which would mask the bucketing contract under test)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bl.join(bo, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity"), first("o_totalprice"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    // and the result matches the unbucketed join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(bl.join(bo, col("l_orderkey") === col("o_orderkey")).count() == expected)
  }
}
