package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Equivalence gate for the native binary-search membership that
  * replaced L2's `array_contains` scan: graft_sorted_except must equal
  * `filter(items, x -> !array_contains(set, x))` on every shape —
  * duplicates, empties, non-ASCII (UTF8 binary order vs sort_array's
  * order is the load-bearing contract). */
class SortedOpsSpec extends SparkSpec {

  test("sorted_except equals the filter/array_contains reference on random shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "aa", "ab", "é", "日", "z1", "", " ", "tile x")
    val rows = (1 to 200).map { i =>
      val items = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      val set = Seq.fill(rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.size))).distinct
      (i.toLong, items, set)
    }
    val df = rows.toDF("id", "items", "set")
      .withColumn("sset", sort_array(col("set")))
    val got = df.select(col("id"),
      Vectors.sortedExceptFast(spark, col("items"), col("sset")).as("kept"))
    val want = df.select(col("id"),
      filter(col("items"), x => !array_contains(col("sset"), x)).as("kept"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "sorted_except diverged from the array_contains reference")
  }

  test("graft_min_ids equals slice(array_sort(collect_list), 1, cap) on hot, tiny, and duplicate-bearing groups") {
    import spark.implicits._
    // group 0: hot (5000 members, > cap); group 1: tiny; group 2:
    // duplicates straddling the cap boundary; ids arrive UNSORTED
    val rows =
      (0 until 5000).map(i => (0L, (7919L * i) % 100000L)) ++
      Seq((1L, 42L), (1L, 7L)) ++
      (0 until 30).flatMap(i => Seq((2L, 5L), (2L, 9L), (2L, 5L)))
    val df = rows.toDF("g", "doc_id").repartition(8)
    for (cap <- Seq(1, 3, 50, 1000)) {
      val got = df.groupBy("g")
        .agg(graft.functions.TopK.minIds(spark, cap, col("doc_id")).as("a"))
      val want = df.groupBy("g")
        .agg(expr(s"slice(array_sort(collect_list(doc_id)), 1, $cap)").as("a"))
      val g = got.orderBy("g").collect().map(r => r.getSeq[Long](1))
      val w = want.orderBy("g").collect().map(r => r.getSeq[Long](1))
      assert(g.toSeq == w.toSeq, s"cap=$cap: bounded agg diverged")
    }
    // empty-group shape: aggregating zero rows after a filter
    val e = df.where(col("doc_id") < -1)
      .agg(graft.functions.TopK.minIds(spark, 10, col("doc_id")).as("a"))
      .head().getSeq[Long](0)
    assert(e.isEmpty)
  }

  test("sorted_except on an empty set is the identity; on a superset it empties") {
    import spark.implicits._
    val df = Seq((1L, Seq("x", "y", "x"))).toDF("id", "items")
    val id = df.select(Vectors.sortedExceptFast(spark, col("items"),
      lit(Array.empty[String])).as("k")).head().getSeq[String](0)
    assert(id == Seq("x", "y", "x"), s"empty-set subtraction changed rows: $id")
    val none = df.select(Vectors.sortedExceptFast(spark, col("items"),
      sort_array(array(lit("y"), lit("x")))).as("k")).head().getSeq[String](0)
    assert(none.isEmpty, s"superset subtraction kept: $none")
  }
}
