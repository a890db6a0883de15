package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters
import graft.sources.Tables

/** K7: Misra–Gries heavy hitters — published bounds gated against
  * exact counts, across partitionings. */
class HeavyHittersSpec extends SparkSpec {

  private def tokens = Tables.documents(spark, sfDir)
    .select(explode(split(col("text"), " ")).as("token"))

  test("MG bounds hold: guaranteed survivors present, undercount <= n/(k+1), never overcount") {
    val k = 8
    val exact = tokens.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (k + 1)
    for (parts <- Seq(1, 7, 32)) {
      val sk = tokens.repartition(parts)
        .agg(HeavyHitters.mgSketchOf(col("token"), k).as("sk"))
        .collect()(0).getMap[String, Long](0)
      assert(sk.size <= k, s"sketch overflowed: ${sk.size} > $k counters")
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(sk.contains(t),
            s"parts=$parts: true-count $c > $bound item '$t' missing from sketch")
      }
      sk.foreach { case (t, est) =>
        val c = exact.getOrElse(t, 0L)
        assert(est <= c, s"parts=$parts: '$t' overcounted ($est > $c)")
        assert(c - est <= bound,
          s"parts=$parts: '$t' undercounted past the bound ($c - $est > $bound)")
      }
    }
  }

  test("per-group sketches: every group obeys its own bound") {
    val k = 6
    val perSrc = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val exact = perSrc.groupBy("source", "token").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = exact.groupMapReduce(_._1._1)(_._2)(_ + _)
    val sks = perSrc.groupBy("source")
      .agg(HeavyHitters.mgSketchOf(col("token"), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    assert(sks.nonEmpty)
    sks.foreach { case (src, sk) =>
      val bound = totals(src) / (k + 1)
      assert(sk.size <= k)
      exact.filter(_._1._1 == src).foreach { case ((_, t), c) =>
        if (c > bound) assert(sk.contains(t), s"$src/'$t' ($c > $bound) missing")
      }
    }
  }
}
