package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.sources.Tables

/** R1: DSIR-style importance weights — Data Selection via Importance
  * Resampling (Xie et al. 2023) computed entirely in-engine. The
  * published recipe: featurize documents as bags of hashed n-grams,
  * fit unigram feature models for a TARGET distribution and the RAW
  * corpus, and weight each raw document by its log likelihood ratio
  * `log w(x) = Σ_f c_f(x)·(log p_t(f) − log p_r(f))` — documents that
  * look like the target get boosted, generic crawl mass gets damped.
  * The weight column then feeds the existing samplers (K2's A-ES, P5's
  * weighted draw) exactly as the paper resamples from the weighted
  * pool.
  *
  * Target distribution: the E2 confident-high band (quality ≥
  * [[TargetBand]] — the P2 weak-label device; a deployment would point
  * this at Wikipedia/books and DSIR the crawl toward it). The target
  * is defined by a PER-ROW predicate, so the target-side counts come
  * from the same single pass as the raw-side counts — no second scan,
  * no join.
  *
  * Scale shape: one narrow featurize pass (fused shingles → md5 bucket
  * hash, [[NBuckets]]-bounded feature ids) feeding ONE aggregation
  * whose map-side partial agg collapses each task to ≤[[NBuckets]]
  * rows; the λ(f) model is bucket-bounded → broadcast back; scoring is
  * a map-side join + doc-grain aggregation. The only corpus-scale
  * exchanges carry (feature, partial-count) and (doc, partial-sum)
  * rows, never the gram stream. Both unigram and bigram features ride
  * one explode.
  *
  * Engine determinism: counts are integers; λ(f) is `ln` of exact
  * integer-derived ratios (the O4 device); the per-doc sum is rounded
  * to 6 dp before output and before the `boosted` comparison.
  */
object Dsir {

  /** Hashed feature space (unigrams + bigrams share it, as published). */
  val NBuckets = 4096
  /** Laplace-style smoothing pseudo-count per bucket. */
  val Alpha = 0.5
  /** E2 score at/above which a doc belongs to the target sample. */
  val TargetBand = 0.56

  private val salt = "dsir"

  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeightsFrom(spark,
      Tables.parallelized(spark, Tables.documents(spark, dir)))

  def dsirWeightsFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    // featurize: hashed word unigrams + bigrams, occurrences kept
    // (DSIR counts feature multiplicity), one fused narrow pass
    val feat: Column = Sampling.hashBucket(col("g"), salt) % NBuckets
    def featsOf(d: DataFrame): DataFrame = d
      .select(col("doc_id"),
        explode(concat(
          Vectors.shinglesFast(spark, col("text"), 1, distinct = false),
          Vectors.shinglesFast(spark, col("text"), 2, distinct = false)))
          .as("g"))
      .select(col("doc_id"), feat.as("f"))
    val g = featsOf(docs)
    // Fit as TWO flag-free branches, not one pass carrying a per-doc
    // target flag through the explode: the flag projection sits ABOVE
    // the Generate, so the quality predicate's string ops re-evaluate
    // PER FEATURE ROW (~100× per doc here; the R5 profile measured
    // the same shape at 187 s/100× on its 3× denser gram stream). As
    // a WHERE on the doc frame the predicate runs once per doc below
    // the Generate and the branches meet at feature grain.
    // localCheckpoint: counts is a ≤NBuckets-row model artifact with
    // TWO consumers (totals + λ) — without it each consumer re-runs
    // the corpus-scale feature explode (fit branches + score = three
    // explodes total, the deliberate recompute-over-materialize floor
    // for a corpus-×-tokens stream)
    val counts = g.groupBy("f").agg(count(lit(1)).as("c_r"))
      .join(featsOf(docs.where(
          TextAnalysis.qualityScore(col("text")) >= TargetBand))
        .groupBy("f").agg(count(lit(1)).as("c_t")), Seq("f"), "left")
      .select(col("f"), col("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
      .localCheckpoint()
    val tot = counts.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    val lam = counts.crossJoin(broadcast(tot))
      .select(col("f"),
        (log((col("c_t") + Alpha) / (col("n_t") + Alpha * NBuckets)) -
          log((col("c_r") + Alpha) / (col("n_r") + Alpha * NBuckets)))
          .as("lam"))
    g.join(broadcast(lam), Seq("f"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), round(sum(col("lam")), 6).as("log_w"))
      .withColumn("boosted", col("log_w") > 0.0)
      .orderBy("doc_id")
  }

  /** DuckDB twin — the model is pure counting, so the WHOLE recipe
    * (featurize → fit → score) is restated in SQL; nothing needs the
    * VALUES-literal device. Gram build matches the Shingles expression
    * (single-space split keeping empties, end-truncated window,
    * max(T−n+1, 1) grams). */
  def dsirWeightsSql: String = {
    val q = TextAnalysis.qualityScoreSql("text")
    val fHash = Sampling.hashBucketSql("gtxt", salt)
    s"""WITH toks AS (
      |  SELECT doc_id, $q >= $TargetBand AS is_target,
      |    string_split(text, ' ') AS tk
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, is_target, unnest(list_concat(
      |    list_transform(range(1, greatest(len(tk) + 1, 2)),
      |      i -> array_to_string(tk[i:i], ' ')),
      |    list_transform(range(1, greatest(len(tk), 2)),
      |      i -> array_to_string(tk[i:i+1], ' ')))) AS gtxt
      |  FROM toks),
      |f AS (SELECT doc_id, is_target, $fHash % $NBuckets AS f FROM g),
      |c AS (
      |  SELECT f, count(*) AS c_r,
      |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS c_t
      |  FROM f GROUP BY f),
      |tot AS (SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
      |               CAST(sum(c_t) AS BIGINT) AS n_t FROM c),
      |lam AS (
      |  SELECT f, ln((c_t + $Alpha) / (n_t + $Alpha * $NBuckets))
      |         - ln((c_r + $Alpha) / (n_r + $Alpha * $NBuckets)) AS lam
      |  FROM c, tot)
      |SELECT f.doc_id, count(*) AS n_feats,
      |  round(sum(lam), 6) AS log_w,
      |  round(sum(lam), 6) > 0.0 AS boosted
      |FROM f JOIN lam USING (f)
      |GROUP BY f.doc_id
      |ORDER BY doc_id""".stripMargin
  }
}
