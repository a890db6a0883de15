package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Output-shaping operators for a training-data pipeline: packing the
  * curated corpus into fixed-token-budget shards, and drawing exact
  * per-stratum samples.
  *
  * Both are pure window/aggregation plans — no UDFs, no collects —
  * and both carry DuckDB oracle twins.
  */
object Packing {

  /** I1: training-shard packing — "concatenate then chunk" semantics.
    *
    * Documents are laid out in a deterministic global order (md5 of
    * doc_id, then doc_id — the same hash-order used by the sampling
    * and token-budget operators, so shard membership is stable across
    * runs and engines), token counts are prefix-summed, and a doc's
    * shard is the fixed-size token block its START offset falls in:
    * `shard_id = floor(start_off / shardTokens)` — exactly the block
    * an LM data loader concatenating documents in this order would
    * begin reading the doc from. The output is per-shard stats, so
    * result size is `total_tokens / shardTokens` regardless of corpus
    * size.
    *
    * Scale shape (the same two-level prefix-sum used by
    * [[Sampling.tokenBudget]]): a global `ORDER BY h` window would
    * serialize the corpus through ONE task. Instead the first two hex
    * digits of `h` — a PREFIX of the sort key, so bucket order refines
    * global order — split the corpus into 256 ordered buckets:
    *   1. per-bucket token totals (partial agg, one narrow pass),
    *   2. a 256-row window turns them into exclusive bucket offsets,
    *   3. the intra-bucket running sum (window partitioned BY BUCKET,
    *      ~n/256 rows per task) plus the broadcast bucket offset
    *      reconstructs the exact global prefix sum.
    * At 100 TB widen the prefix (3 hex digits = 4096 buckets) to keep
    * per-task windows in memory; the plan shape is unchanged. The
    * shard-stats aggregation shuffles `total_tokens/S` distinct shard
    * ids — map-side partial agg collapses each bucket's rows first.
    */
  def shardPack(spark: SparkSession, dir: String,
                shardTokens: Long = 2000L, salt: String = "shard"): DataFrame =
    shardPackFrom(Tables.documents(spark, dir), shardTokens, salt)

  /** [[shardPack]] over an arbitrary (doc_id, text, ...) frame — the
    * composable form the pipeline funnel feeds with its survivor set
    * (the curateFrom precedent). */
  def shardPackFrom(docs: DataFrame,
                    shardTokens: Long = 2000L, salt: String = "shard"): DataFrame = {
    val wCum = Window.partitionBy("bkt").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // shared machinery with tokenBudget (PrefixSum): hash/bucket
    // columns + a GLOBAL (no part cols) 256-row offsets window,
    // broadcast back. est_tokens is 0 (never NULL) for null text by
    // PrefixSum's contract, so start_off/shard_id can't go NULL.
    PrefixSum.withBucketOffsets(
      PrefixSum.hashedBase(docs, salt), Nil)
      .withColumn("start_off",
        col("offset") + coalesce(sum(col("est_tokens")).over(wCum), lit(0L))
          - col("est_tokens"))
      .select(col("doc_id"), col("est_tokens"),
        floor(col("start_off") / lit(shardTokens.toDouble)).as("shard_id"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("est_tokens").as("shard_tokens"),
        min("doc_id").as("first_doc"))
      .orderBy("shard_id")
  }

  /** DuckDB twin: the semantically-identical SINGLE global window —
    * the two-level form above computes the same prefix sum because the
    * bucket id is a prefix of the sort key. */
  def shardPackSql(shardTokens: Long = 2000L, salt: String = "shard"): String =
    s"""SELECT CAST(floor(start_off / $shardTokens.0) AS BIGINT) AS shard_id,
      |  count(*) AS n_docs,
      |  CAST(sum(est_tokens) AS BIGINT) AS shard_tokens,
      |  min(doc_id) AS first_doc
      |FROM (
      |  SELECT doc_id, est_tokens,
      |    CAST(sum(est_tokens) OVER (ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - est_tokens AS start_off
      |  FROM (SELECT doc_id,
      |          coalesce(CAST(ceil(length(text) / 4.0) AS BIGINT), 0)
      |            AS est_tokens,
      |          md5(doc_id || ':$salt') AS h
      |        FROM documents) e) c
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** I2: stratified exact-quota sampling — exactly `quota` docs per
    * source (fewer only when a source is smaller than the quota),
    * chosen by deterministic hash rank so the sample is reproducible
    * and engine-independent, unlike `TABLESAMPLE`/`rand()`.
    *
    * Complements [[Sampling.hashSample]] (rate-based, no shuffle) and
    * [[Sampling.mixResample]] (rate-derived): quota sampling is what a
    * fixed-size eval/holdout split needs.
    *
    * Scale: rank-within-group over a hash order. Spark rewrites the
    * `row_number <= k` filter into a WindowGroupLimit: each map task
    * keeps only its local top-k PER SOURCE before the shuffle, so the
    * exchange moves O(sources × quota × tasks) rows, not the corpus
    * (PlanSpec pins the rewrite). Skewed sources are bounded the same
    * way — a 10¹⁰-row source still ships only top-k per task. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       quota: Int = 25, salt: String = "strat"): DataFrame = {
    val rk = row_number().over(
      Window.partitionBy("source")
        .orderBy(md5(concat(col("doc_id").cast("string"), lit(":" + salt))),
          col("doc_id")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", rk)
      .where(col("rk") <= quota)
      .orderBy("doc_id")
  }

  def stratifiedSampleSql(quota: Int = 25, salt: String = "strat"): String =
    s"""SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(doc_id || ':$salt'), doc_id) AS rk
      |  FROM documents) t
      |WHERE rk <= $quota
      |ORDER BY doc_id""".stripMargin
}
