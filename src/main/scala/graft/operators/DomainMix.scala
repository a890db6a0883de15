package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** R3: excess-loss domain reweighting — the DoReMi objective (Xie et
  * al. 2023: Domain Reweighting with Minimax Optimization) computed
  * from in-engine loss signals. DoReMi upweights domains on which the
  * proxy model's loss EXCEEDS a reference — the domains with the most
  * left to learn — via exponentiated-gradient updates on the domain
  * simplex. Here the loss signal is the O4 char-trigram LM (the only
  * model this engine can price text with): a source's mean negative
  * log-probability above the corpus mean is its excess loss, and the
  * published EG step `w_s ∝ exp(η · excess_s)`, normalized over the
  * simplex, is applied in closed form.
  *
  * Honest scope note: full DoReMi RETRAINS the proxy between EG steps,
  * which is what makes the iteration non-trivial; with a fixed scorer,
  * T steps collapse to one step at η·T, so this is the published
  * objective's single-round/fixed-proxy form — the mixture-weight
  * table a trainer consumes ([[Sampling.mixResample]]'s rate map, K2's
  * per-source weights), recomputed each time the loss signal refreshes
  * (the K6/P4 monitoring cadence).
  *
  * Scale shape: the corpus-scale work is exactly O4's (vocabulary-
  * bounded trigram model, doc-grain aggregation); everything after is
  * #sources-row arithmetic. Output: one row per source.
  *
  * Engine determinism: per-doc `avg_logp` is already rounded to 6 dp
  * (O4's contract); the per-source and corpus means are rounded to
  * 6 dp BEFORE the exp so both engines exponentiate identical inputs;
  * the final weight is rounded to 6 dp. */
object DomainMix {

  /** EG step size on excess loss (η·T of the collapsed iteration). */
  val Eta = 1.0

  def domainReweight(spark: SparkSession, dir: String): DataFrame =
    // localCheckpoint: the scored frame is (doc_id, avg_logp) — 16 B a
    // doc — with TWO aggregate consumers (per-source + corpus means);
    // without it each re-runs the corpus-×-trigrams LM pipeline
    domainReweightFrom(
      CharLm.lmScore(spark, dir).select("doc_id", "avg_logp")
        .localCheckpoint(),
      Tables.documents(spark, dir).select("doc_id", "source"))

  /** Composable form over a scored frame (doc_id, avg_logp) and a
    * (doc_id, source) mapping — the production shape once O4 scores
    * are materialized. */
  def domainReweightFrom(scored: DataFrame, docSource: DataFrame): DataFrame = {
    val per = scored.join(docSource, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("avg_logp")), 6).as("mean_logp"))
    val corpus = scored.agg(round(avg(col("avg_logp")), 6).as("corpus_logp"))
    // ex is #sources rows with two consumers (normalizer + output):
    // checkpoint so neither re-derives the doc-grain aggregations
    val ex = per.crossJoin(broadcast(corpus))
      .withColumn("excess",
        round(col("corpus_logp") - col("mean_logp"), 6))
      .withColumn("w_raw", exp(lit(Eta) * col("excess")))
      .localCheckpoint()
    val z = ex.agg(sum("w_raw").as("z"))
    ex.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("mean_logp"), col("excess"),
        round(col("w_raw") / col("z"), 6).as("weight"))
      .orderBy("source")
  }

  /** DuckDB twin — O4's own verified SQL nested as the loss CTE, the
    * same rounded-before-exp discipline. */
  def domainReweightSql: String = {
    val lm = CharLm.lmScoreSql.replace("ORDER BY doc_id", "")
    s"""WITH lm AS ($lm),
      |per AS (
      |  SELECT d.source, count(*) AS n_docs,
      |    round(avg(lm.avg_logp), 6) AS mean_logp
      |  FROM lm JOIN documents d USING (doc_id)
      |  GROUP BY d.source),
      |corpus AS (SELECT round(avg(avg_logp), 6) AS corpus_logp FROM lm),
      |ex AS (
      |  SELECT source, n_docs, mean_logp,
      |    round(corpus_logp - mean_logp, 6) AS excess,
      |    exp($Eta * round(corpus_logp - mean_logp, 6)) AS w_raw
      |  FROM per, corpus),
      |z AS (SELECT sum(w_raw) AS z FROM ex)
      |SELECT source, n_docs, mean_logp, excess,
      |  round(w_raw / z, 6) AS weight
      |FROM ex, z
      |ORDER BY source""".stripMargin
  }
}
