package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** U-series: corpus-scaling and training-prep audit operators. */
class USeriesSpec extends SparkSpec {

  // ---------------------------------------------------------------- U3
  test("source divergence: hand-computed TV on a fixture, bounds and symmetry-free pairs on the corpus") {
    import spark.implicits._
    // Two sources over a 2-token vocabulary (V=256 swallows it, so the
    // OTHER bucket is 0 mass): a = {x:3, y:1}, b = {x:1, y:3}.
    // TV = |3/4-1/4|/2 + |1/4-3/4|/2 ... summed then halved = 1/2.
    val docs = Seq(
      (1L, "x x x y", "a"),
      (2L, "x y y y", "b"),
      (3L, "x y", "c")) // c = {x:1/2, y:1/2}: TV(a,c)=TV(b,c)=1/4
      .toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceDivergenceFrom(spark, docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(math.abs(got(("a", "b")) - 0.5) < 1e-9)
    assert(math.abs(got(("a", "c")) - 0.25) < 1e-9)
    assert(math.abs(got(("b", "c")) - 0.25) < 1e-9)

    // corpus run: every unordered pair exactly once, TV in [0, 1]
    val corpus = CorpusStats.sourceDivergence(spark, sfDir).collect()
    val srcs = corpus.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(corpus.length == srcs * (srcs - 1) / 2,
      s"expected ${srcs * (srcs - 1) / 2} pairs, got ${corpus.length}")
    corpus.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonically ordered")
      val tv = r.getDouble(2)
      assert(tv >= 0.0 && tv <= 1.0 + 1e-9, s"TV out of range: $tv")
    }
  }
}
