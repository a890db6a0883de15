package graft

import org.apache.spark.sql.functions._

import graft.plans.FrozenSeq

/** Round-21 optimization internals: each rewrite here claims
  * bit-identity with the shape it replaced — these tests pin that
  * claim directly (the oracle gate pins it end-to-end).
  */
class R21OptimizationSpec extends SparkSpec {

  test("graft_char_grams equals the transform/sequence/substring HOF chain") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val texts = Seq(
      "abcdef", "abc", "abcd", "a b c d", "  spaced  out  ",
      "exactly3", "ünïcödé grams héré", "日本語のテキストです",
      "mixed ascii と 日本語", "x" * 500)
    val df = texts.toDF("text").where(length(col("text")) >= 3)
    val rows = df.select(
        call_function("graft_char_grams", col("text"), lit(3)).as("native"),
        expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
          .as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("graft_char_grams yields empty array below the guard length") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val out = Seq("ab", "", "é").toDF("text")
      .select(call_function("graft_char_grams", col("text"), lit(3)))
      .collect().map(_.getSeq[String](0))
    assert(out.forall(_.isEmpty))
  }

  test("graft_lut_sum equals the element_at chain over the same flat LUT") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val k = 4
    val m = 3
    val rng = new scala.util.Random(7)
    val lut = Array.fill(2 * m * k)(rng.nextDouble() - 0.5) // 2 slices
    val codes = Seq((Seq(0, 3, 1), 0), (Seq(2, 2, 2), 1), (Seq(1, 0, 3), 1))
    val df = codes.toDF("code", "qidx")
    val rows = df.select(
        call_function("graft_lut_sum", col("code"),
          col("qidx") * lit(m * k), lit(lut), lit(k)).as("kernel"),
        (0 until m).map(mi =>
          element_at(lit(lut), col("qidx") * lit(m * k) +
            lit(mi * k + 1) + element_at(col("code"), mi + 1)))
          .reduce(_ + _).as("chain"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("FrozenSeq: content equality/hash preserved, hash cached") {
    val a = FrozenSeq(IndexedSeq(1.0, 2.0, 3.0))
    val b = FrozenSeq(IndexedSeq(1.0, 2.0, 3.0))
    val c = FrozenSeq(IndexedSeq(1.0, 2.0, 4.0))
    assert(a == b && a.hashCode == b.hashCode)
    assert(a != c)
    assert(a == IndexedSeq(1.0, 2.0, 3.0)) // plain-seq interop
    assert(a.hashCode == IndexedSeq(1.0, 2.0, 3.0).hashCode)
  }

  test("QC trainer is run-to-run deterministic (bit-identical weights)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = graft.operators.QualityClassifier.train(spark, docs)
    val m2 = graft.operators.QualityClassifier.train(spark, docs)
    assert(m1.nTrain == m2.nTrain)
    assert(m1.weights.map(java.lang.Double.doubleToLongBits) ==
      m2.weights.map(java.lang.Double.doubleToLongBits))
  }
}
