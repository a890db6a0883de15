package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Bit-parity of the native gram expressions (graft_shingles /
  * graft_gram_stats) against the exact interpreted-HOF chain they
  * replaced — the chain whose DuckDB twin the oracle still evaluates.
  * Edge inputs cover every split() corner: empty string (one empty
  * token), leading/trailing/consecutive spaces (empty tokens KEPT),
  * docs shorter than n (one truncated gram), multi-byte UTF-8 (0x20
  * never occurs inside a sequence), and duplicate grams (distinct
  * keeps first-occurrence order).
  */
class GramOpsSpec extends SparkSpec {

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a a",                // heavy duplication
    "",                           // one empty token
    " ",                          // two empty tokens
    "  leading and  double  gaps ", // empty tokens everywhere
    "one",                        // shorter than n -> one truncated gram
    "two words",
    "héllo wörld ünïcode tokens ünïcode wörld", // multi-byte UTF-8
    "tab\tis not a separator",
    "x " * 500 + "tail")          // long doc

  private def oldShingles = expr(
    "array_distinct(transform(sequence(1, greatest(size(split(text, ' '))-2, 1)), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i, 3))))")

  private def oldGrams(n: Int) = expr(
    s"transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
      s"i -> concat_ws(' ', slice(split(text, ' '), i, $n)))")

  test("graft_shingles(n=3, distinct) equals the replaced HOF chain, order included") {
    import spark.implicits._
    val df = fixtures.toDF("text")
    val rows = df.select(
      Vectors.shinglesFast(spark, col("text"), 3, distinct = true).as("fast"),
      oldShingles.as("slow")).collect()
    rows.zip(fixtures).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle drift on ${t.take(40)}: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("graft_shingles non-distinct equals the raw gram list for n=2..4") {
    import spark.implicits._
    val df = fixtures.toDF("text")
    for (n <- 2 to 4) {
      val rows = df.select(
        Vectors.shinglesFast(spark, col("text"), n, distinct = false).as("fast"),
        oldGrams(n).as("slow")).collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"n=$n drift: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}"))
    }
  }

  test("graft_gram_stats equals [size, size(array_distinct)] of the gram list") {
    import spark.implicits._
    val df = fixtures.toDF("text")
    for (n <- 2 to 3) {
      val rows = df.select(
        Vectors.gramStatsFast(spark, col("text"), n).as("fast"),
        size(oldGrams(n)).cast("long").as("total"),
        size(array_distinct(oldGrams(n))).cast("long").as("dist")).collect()
      rows.foreach { r =>
        val fast = r.getSeq[Long](0)
        assert(fast == Seq(r.getLong(1), r.getLong(2)),
          s"n=$n stats drift: $fast vs (${r.getLong(1)}, ${r.getLong(2)})")
      }
    }
  }

  test("null text behaves as empty text — exactly what the replaced HOF chain produced") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("a b c")).toDF("text")
    // the replaced chain does NOT null-propagate: concat_ws(' ',
    // slice(NULL, 1, n)) swallows the null slice into one
    // empty-string gram, so NULL text == "" text == [""] — the native
    // expressions must match, or null-text docs change shape vs the
    // unchanged twins
    val chain = expr(
      "array_distinct(transform(sequence(1, greatest(size(split(text, ' '))-2, 1)), i -> concat_ws(' ', slice(split(text, ' '), i, 3))))")
    val rows = df.select(
      Vectors.shinglesFast(spark, col("text"), 3, distinct = true).as("sh"),
      chain.as("old"),
      Vectors.gramStatsFast(spark, col("text"), 2).as("st")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getSeq[String](0) == Seq(""),
      "native shingles on null text must be [\"\"]")
    assert(rows(0).getSeq[String](1) == Seq(""),
      "premise: the HOF chain returns [\"\"] on null text")
    assert(rows(0).getSeq[Long](2) == Seq(1L, 1L),
      "native gram stats on null text must be [1, 1] (the one empty gram)")
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(2))
  }

  test("graft_nb_scores rejects gram buckets outside the model dim with a named error") {
    import spark.implicits._
    // dim=4 table (2 classes x 4 grams); bucket 7 and -1 are both
    // model/featurizer mismatches — the kernel must name itself and
    // the offending bucket/dim instead of a raw AIOOBE
    for (bad <- Seq(7, -1)) {
      val e = intercept[Exception] {
        Seq(Seq(0, bad)).toDF("gs").select(
          call_function("graft_nb_scores", col("gs"),
            typedlit(Seq(-0.5, -0.7)),
            typedlit(Seq(-1.0, -2.0, -3.0, -4.0,
              -1.5, -2.5, -3.5, -4.5)))).collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("graft_nb_scores") && msg.contains("dim"),
        s"bucket $bad: expected a named diagnostic, got $e")
    }
    // in-range buckets still score
    val ok = Seq(Seq(0, 3)).toDF("gs").select(
      call_function("graft_nb_scores", col("gs"),
        typedlit(Seq(-0.5, -0.7)),
        typedlit(Seq(-1.0, -2.0, -3.0, -4.0,
          -1.5, -2.5, -3.5, -4.5)))).head().getSeq[Double](0)
    assert(math.abs(ok.head - (-0.5 - 1.0 - 4.0)) < 1e-12)
  }
}
