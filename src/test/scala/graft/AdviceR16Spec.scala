package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.operators.{CharLm, Chunking, DomainMix, RuleFilters, Sampling}

/** Pins the round-15/16 ADVICE fixes so none can regress silently:
  * the Gopher symbol-ratio boundary (paper removes ratios GREATER
  * than 0.1 — a doc exactly at the bound is kept), NULL-text docs
  * surviving cdcChunks, the excessLossSelect empty-sample cut
  * coalescing to select-all instead of NULL-dropping every row, the
  * sample-sort cap guard firing loudly on an oversized cut sample,
  * the temperature-mix micro-weights being frozen driver-side (no
  * engine re-evaluates pow), and O4's from-form ≡ self-contained
  * contract incl. the unknown-gram γ-floor. */
class AdviceR16Spec extends SparkSpec {

  import spark.implicits._

  test("Gopher symbol ratio exactly at 0.1 is KEPT (paper removes only > 0.1)") {
    // 10 words, exactly one '#' -> symbol_ratio = 1/10 = 0.1 exactly
    val text = "alpha beta gamma delta epsilon zeta eta theta iota #kappa"
    val out = RuleFilters.gopherVerdicts(
      Seq((1L, text)).toDF("doc_id", "text")).collect().head
    assert(out.getAs[Double]("symbol_ratio") == 0.1)
    assert(out.getAs[Boolean]("r_symbol"),
      "a doc exactly at the 0.1 bound must pass the symbol rule")
    // and strictly above still fails
    val above = RuleFilters.gopherVerdicts(
      Seq((2L, "alpha beta gamma delta epsilon zeta eta theta #iota #kappa"))
        .toDF("doc_id", "text")).collect().head
    assert(!above.getAs[Boolean]("r_symbol"))
  }

  test("a NULL-text doc survives cdcChunks as one empty chunk instead of vanishing") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, null))
      .toDF("doc_id", "text")
    val out = Chunking.cdcDedupFrom(docs)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L),
      s"NULL-text doc missing from the dup report: $ids")
    val r2 = out.where(col("doc_id") === 2L).collect().head
    assert(r2.getAs[Long]("n_chunks") == 1L)
  }

  test("excessLossSelect with an EMPTY hash sample selects everything, not nothing") {
    // ids whose salted bucket is ABOVE the sample bar -> empty sample
    val pool = (0L until 4000L).toDF("doc_id")
      .withColumn("b", Sampling.hashBucket(col("doc_id"), "xl"))
    val outIds = pool.where(col("b") >= CharLm.PplSampleBar)
      .select("doc_id").as[Long].head(4)
    assert(outIds.length == 4)
    val docs = outIds.toSeq
      .map(i => (i, "the quick brown fox jumps over the lazy dog " * 2))
      .toDF("doc_id", "text")
    val out = CharLm.excessLossSelectFrom(docs).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getAs[Boolean]("selected")),
      "empty-sample cut must coalesce to select-all, never NULL-drop")
  }

  test("an oversized cut sample trips the sample-sort guard loudly") {
    val pool = (0L until 4000L).toDF("doc_id")
      .withColumn("b", Sampling.hashBucket(col("doc_id"), "xl"))
    val inIds = pool.where(col("b") < CharLm.PplSampleBar)
      .select("doc_id").as[Long].head(5)
    assert(inIds.length == 5)
    val docs = inIds.toSeq
      .map(i => (i, "the quick brown fox jumps over the lazy dog " * 2))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      CharLm.excessLossSelectFrom(docs, sortCap = 3L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds single-sort cap")),
      s"guard did not fire: $e")
    // and the untripped path is unchanged
    assert(CharLm.excessLossSelectFrom(docs).count() == 5)
  }

  test("temperature-mix micro-weights are frozen driver-side literals in the oracle") {
    val sql = {
      // train + dump through the real path so the cache is warm
      DomainMix.mixTemperature(spark, sfDir).collect()
      DomainMix.mixTemperatureSql
    }
    assert(!sql.toLowerCase.contains("pow("),
      "oracle SQL re-evaluates pow — micro-weights must ride as literals")
    assert(sql.contains("VALUES"))
    // the frozen integers are the Math.pow/Math.round path's
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (s, n) =>
      val w = Math.round(Math.pow(n.toDouble, DomainMix.TempAlpha) *
        DomainMix.TempWScale)
      assert(sql.contains(s"CAST($w AS BIGINT)"),
        s"frozen weight for $s ($w) not found in oracle SQL")
    }
  }

  test("O4 from-form over a persisted gram table equals the self-contained score") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(300).localCheckpoint()
    val self = CharLm.lmScoreFrom(docs).collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_lmm").toFile
    try {
      CharLm.lmModelFrom(docs).write.mode("overwrite")
        .parquet(dir.getPath)
      val persisted = spark.read.parquet(dir.getPath)
      val from = CharLm.lmScoreWith(docs, persisted).collect()
      assert(self.toSeq == from.toSeq,
        "steady-state scoring diverged from the self-contained form")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("unknown trigrams under a persisted model price as the γ-floor, not a drop") {
    val trainDocs = Seq((1L, "aaaaaaaaaa")).toDF("doc_id", "text")
    val model = CharLm.lmModelFrom(trainDocs)
    val out = CharLm.lmScoreWith(
      Seq((2L, "zzzz")).toDF("doc_id", "text"), model).collect().head
    assert(out.getAs[Long]("n_grams") == 2L,
      "unknown grams must stay in the stream")
    val floor = BigDecimal(math.log(1.0 / CharLm.Gamma))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("avg_logp") == floor)
  }
}
