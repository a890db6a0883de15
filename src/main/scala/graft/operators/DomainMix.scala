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

  /** Repeat cap for [[epochAlloc]] — published data-constrained
    * scaling work (Muennighoff et al. 2023, Scaling Data-Constrained
    * Language Models) finds repeating data ~4 epochs near-free and
    * diminishing after; the cap is the knob. 3 here so the fixture's
    * ±15% per-source token spread puts the water level mid-pack and
    * the capped set actually splits. */
  val AllocEpochCap = 3
  /** Training budget as a RATIONAL multiple (11/4 = 2.75x) of total
    * corpus tokens - integer arithmetic in both engines, and strictly
    * under the Sigma-cap = 3x ceiling so the capped set is a proper
    * subset (at 3x budget every source caps and the allocator
    * degenerates to "everything, three times"). */
  val AllocBudgetNum = 11
  val AllocBudgetDen = 4

  /** S3: epoch-capped token-budget allocation — the allocator that
    * turns R3's mixture WEIGHTS into per-source token COUNTS a loader
    * can consume. Given a budget B = [[AllocBudgetNum]]/[[AllocBudgetDen]] × corpus
    * tokens, each source wants its weighted share w_s·B but may not
    * repeat more than [[AllocEpochCap]] epochs of what it has (the
    * data-constrained regime); surplus from capped sources spreads
    * over the uncapped PROPORTIONALLY TO WEIGHT. The P3 UniMax
    * waterfill generalized from uniform-weight doc counts to
    * arbitrary-weight token counts (UniMax is the w_s = 1/S, unit
    * token special case).
    *
    * Same closed form, weighted: sort sources ascending by
    * cap_s / w_s (the budget level at which s caps); the capped set is
    * a prefix, so one #sources-row window pass decides it:
    * capped_s ⟺ cap_s · W_suffix ≤ w_s · (B − cum_prev_cap), then
    * alloc = cap (capped) or ⌊w_s · R / W_uncapped⌋. Scale shape: one
    * per-source token aggregation; everything after is windows over
    * #sources rows. Float discipline: weights arrive 6-dp rounded,
    * every weight SUM is re-rounded to 6 dp before use (summation
    * order must not leak into the comparison), caps and budget stay
    * integer, so both engines compare identical doubles. */
  def epochAlloc(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    epochAllocFrom(
      domainReweight(spark, dir).select("source", "weight"),
      docs.groupBy("source")
        .agg(sum(ceil(length(col("text")) / lit(4.0)).cast("long"))
          .as("avail_tokens")))
  }

  /** Allocation over a (source, weight) frame (simplex weights,
    * 6-dp) and a (source, avail_tokens) frame. */
  def epochAllocFrom(weights: DataFrame, avail: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = avail.agg(
      expr(s"(sum(avail_tokens) * $AllocBudgetNum) DIV $AllocBudgetDen")
        .as("b"))
    val wOrd = Window.orderBy(col("ratio"), col("source"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    avail.join(weights, Seq("source"))
      .withColumn("cap_tokens", col("avail_tokens") * AllocEpochCap)
      .withColumn("ratio", col("cap_tokens") / col("weight"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_cap_prev",
        coalesce(sum("cap_tokens").over(wPrev), lit(0L)))
      .withColumn("w_cum_prev",
        round(coalesce(sum("weight").over(wPrev), lit(0.0)), 6))
      .withColumn("w_total", round(sum("weight").over(wAll), 6))
      .withColumn("w_suffix", round(col("w_total") - col("w_cum_prev"), 6))
      .withColumn("capped",
        col("cap_tokens") * col("w_suffix") <=
          col("weight") * (col("b") - col("cum_cap_prev")))
      .withColumn("capped_cap",
        coalesce(sum(when(col("capped"), col("cap_tokens"))).over(wAll),
          lit(0L)))
      .withColumn("capped_w",
        round(coalesce(sum(when(col("capped"), col("weight"))).over(wAll),
          lit(0.0)), 6))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .otherwise(floor(col("weight") * (col("b") - col("capped_cap")) /
            (col("w_total") - col("capped_w")))))
      .select(col("source"), col("avail_tokens"), col("weight"),
        col("cap_tokens"), col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") / col("avail_tokens"), 6)
          .as("epochs"),
        col("capped"))
      .orderBy("source")
  }

  def epochAllocSql: String = {
    val wt = domainReweightSql.replace("ORDER BY source", "")
    s"""WITH wt AS (SELECT source, weight FROM ($wt)),
      |av AS (
      |  SELECT source,
      |    CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
      |      AS avail_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST((sum(avail_tokens) * $AllocBudgetNum)
      |          // $AllocBudgetDen AS BIGINT) AS b FROM av),
      |base AS (
      |  SELECT av.source, avail_tokens, weight,
      |    avail_tokens * $AllocEpochCap AS cap_tokens,
      |    CAST(avail_tokens * $AllocEpochCap AS DOUBLE) / weight AS ratio
      |  FROM av JOIN wt USING (source)),
      |w AS (
      |  SELECT *, b,
      |    coalesce(sum(cap_tokens) OVER (ORDER BY ratio, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_cap_prev,
      |    round(coalesce(sum(weight) OVER (ORDER BY ratio, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 6)
      |      AS w_cum_prev,
      |    round(sum(weight) OVER (), 6) AS w_total
      |  FROM base, tot),
      |f AS (
      |  SELECT *,
      |    cap_tokens * round(w_total - w_cum_prev, 6) <=
      |      weight * (b - cum_cap_prev) AS capped
      |  FROM w),
      |agg AS (
      |  SELECT coalesce(sum(cap_tokens) FILTER (WHERE capped), 0) AS capped_cap,
      |    round(coalesce(sum(weight) FILTER (WHERE capped), 0), 6) AS capped_w
      |  FROM f)
      |SELECT source, avail_tokens, weight, cap_tokens,
      |  CAST(CASE WHEN capped THEN cap_tokens
      |       ELSE floor(weight * (b - capped_cap) / (w_total - capped_w))
      |       END AS BIGINT) AS alloc_tokens,
      |  round(CAST(CASE WHEN capped THEN cap_tokens
      |       ELSE floor(weight * (b - capped_cap) / (w_total - capped_w))
      |       END AS DOUBLE) / avail_tokens, 6) AS epochs,
      |  capped
      |FROM f, agg
      |ORDER BY source""".stripMargin
  }

  private val AllocMatSalt = "allocmat"

  /** S6: materialize the S3 allocation into per-document draw counts
    * — the table a shard-packer/loader actually consumes (the P3
    * materialization contract, token-weighted): source s with
    * alloc_s tokens over avail_s available emits `alloc DIV avail`
    * full copies of every doc, plus ONE extra copy for the docs in
    * the salted-hash-ordered prefix whose inclusive token running
    * sum fits the residual `alloc MOD avail` (H11's cum ≤ budget
    * rule, applied per source). Capped sources fall out for free:
    * alloc = cap ⇒ residual 0, exactly [[AllocEpochCap]] copies.
    *
    * Scale shape: the residual rank is the TWO-LEVEL PrefixSum (the
    * P3 lesson — never a full per-source window): per-(source,
    * hash-bucket) offsets, whole past-residual buckets pruned BEFORE
    * the broadcast join, intra-bucket running sums only in the few
    * straddling buckets. The oracle states the single-window form;
    * the plans are proven equal by the shared PrefixSum invariants.
    * ALL-INTEGER — both engines agree exactly. */
  def epochAllocMaterialize(spark: SparkSession, dir: String): DataFrame =
    epochAllocMaterializeFrom(
      Tables.parallelized(spark, Tables.documents(spark, dir)),
      epochAlloc(spark, dir))

  /** Materialization over an arbitrary docs frame and a persisted
    * (source, alloc_tokens, avail_tokens, …) allocation table — the
    * production shape once the allocation is decided. */
  def epochAllocMaterializeFrom(docs: DataFrame, alloc: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allocF = alloc
      .select(col("source"),
        expr("alloc_tokens DIV avail_tokens").as("full_e"),
        expr("alloc_tokens % avail_tokens").as("resid"))
      .localCheckpoint() // #sources rows, three consumers below
    val base = PrefixSum.hashedBase(docs, AllocMatSalt, Seq("source"))
    // prune: a bucket whose exclusive offset already exceeds the
    // source's residual cannot emit an extra copy — drop it while the
    // offsets frame is still sources×256 rows; keep `resid` riding
    // along so the cum comparison needs no second join
    val withOff = PrefixSum.withBucketOffsets(base, Seq("source"),
      offs => offs
        .join(broadcast(allocF.select("source", "resid")), Seq("source"))
        .where(col("offset") <= col("resid")))
    val wCum = Window.partitionBy("source", "bkt")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val extra = withOff
      .withColumn("cum",
        col("offset") + coalesce(sum("est_tokens").over(wCum), lit(0L)))
      .where(col("cum") <= col("resid"))
      .select(col("doc_id"), lit(1L).as("extra"))
    docs.select(col("doc_id"), col("source"),
        coalesce(ceil(length(col("text")) / lit(4.0)).cast("long"), lit(0L))
          .as("est_tokens"))
      .join(broadcast(allocF.select("source", "full_e")), Seq("source"))
      .join(extra, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("est_tokens"),
        (col("full_e") + coalesce(col("extra"), lit(0L))).as("n_copies"))
      .orderBy("doc_id")
  }

  /** Single-window oracle twin (the form the two-level plan is
    * proven equal to). */
  def epochAllocMaterializeSql: String = {
    val alloc = epochAllocSql.replace("ORDER BY source", "")
    s"""WITH alloc AS (
      |  SELECT source, alloc_tokens // avail_tokens AS full_e,
      |         alloc_tokens % avail_tokens AS resid
      |  FROM ($alloc)),
      |est AS (SELECT doc_id, source,
      |          coalesce(CAST(ceil(length(text) / 4.0) AS BIGINT), 0)
      |            AS est_tokens
      |        FROM documents),
      |cum AS (
      |  SELECT doc_id, source, est_tokens,
      |    CAST(sum(est_tokens) OVER (PARTITION BY source
      |      ORDER BY md5(doc_id || ':$AllocMatSalt'), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM est)
      |SELECT c.doc_id, c.source, c.est_tokens,
      |  CAST(full_e + CASE WHEN cum <= resid THEN 1 ELSE 0 END AS BIGINT)
      |    AS n_copies
      |FROM cum c JOIN alloc USING (source)
      |ORDER BY doc_id""".stripMargin
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

  // ---------------------------------------------------------- H12
  /** Temperature exponent: the published multilingual default
    * (XLM-R trains with alpha = 0.3; T5's temperature-scaled mixing is
    * the same recipe with T = 1/alpha). */
  val TempAlpha = 0.3
  /** Weights are fixed at micro-precision before any integer
    * apportionment, so both engines allocate from identical integers. */
  val TempWScale = 1000000L

  /** H12: temperature-scaled source mixing (Raffel et al. 2020 §3.4.2;
    * Conneau et al. 2020) — the third published mixing law next to
    * H10's uniform cap and P3's UniMax: sampling mass proportional to
    * n_s^alpha, which flattens the source distribution WITHOUT fully
    * equalizing it (alpha = 1 is proportional, alpha = 0 uniform). The
    * output is the per-source draw allocation for a same-size epoch
    * (budget = n_total): over-represented sources land draw < avail
    * (downsample), rare sources draw > avail (repetition — `epochs`
    * makes the repetition factor explicit, the data-constrained
    * signal S3 then caps).
    *
    * Engine determinism: the ONLY float step is pow(n, alpha),
    * immediately frozen to an integer micro-weight
    * (round(pow·10⁶)); allocation is the exact largest-remainder
    * method in pure integers — base = B·w DIV W, remainders ranked
    * (rem DESC, source ASC) — so cross-engine pow ulps are absorbed
    * at the freeze and everything after is bit-exact. B·w stays
    * within Long for corpora to ~10¹¹ docs (w ≤ ~10⁸ micro-units).
    *
    * Scale shape: everything after the one source-grain count
    * aggregation operates on #sources rows; the rank window is over
    * the bounded source table. */
  /** Frozen per-source micro-weights (source, n_docs, w): the ONE
    * float step — pow(n, alpha) — runs driver-side over the bounded
    * #sources count table and is frozen to integers HERE, so the
    * Spark plan and the DuckDB oracle both allocate from the same
    * literal integers and no engine ever re-evaluates pow (a 1-ulp
    * libm difference at a .5 rounding boundary would otherwise flip
    * a micro-weight between engines). */
  private[operators] val tempWeightCache =
    new OracleModelCache[Seq[(String, Long, Long)]]((spark, dir) =>
      Tables.documents(spark, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs")).orderBy("source")
        .collect().toSeq.map { r =>
          val n = r.getLong(1)
          (r.getString(0), n,
            Math.round(Math.pow(n.toDouble, TempAlpha) * TempWScale))
        })

  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = tempWeightCache.model(spark, dir)
    mixTempAlloc(m.toDF("source", "n_docs", "w"))
  }

  /** From-form over an arbitrary docs frame (spec/composition use):
    * same allocation, weights frozen through the identical
    * driver-side Math.pow/Math.round path as [[mixTemperature]]. */
  def mixTemperatureFrom(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .orderBy("source").collect().toSeq.map { r =>
        val n = r.getLong(1)
        (r.getString(0), n,
          Math.round(Math.pow(n.toDouble, TempAlpha) * TempWScale))
      }
    mixTempAlloc(counts.toDF("source", "n_docs", "w"))
  }

  /** Exact largest-remainder apportionment in pure integers over the
    * frozen (source, n_docs, w) table. */
  private def mixTempAlloc(w: DataFrame): DataFrame = {
    val tot = w.agg(sum(col("w")).as("w_tot"), sum(col("n_docs")).as("b"))
    val alloc = w.crossJoin(broadcast(tot))
      .withColumn("base", expr("b * w DIV w_tot"))
      .withColumn("rem", expr("(b * w) % w_tot"))
      .localCheckpoint() // bounded #sources rows, three consumers
    val leftover = alloc.agg((first(col("b")) - sum(col("base"))).as("r"))
    import org.apache.spark.sql.expressions.Window
    val wRk = Window.orderBy(col("rem").desc, col("source"))
    alloc.withColumn("rk", row_number().over(wRk))
      .crossJoin(broadcast(leftover))
      .select(col("source"), col("n_docs"),
        round(col("w").cast("double") / TempWScale, 6).as("weight"),
        (col("base") + when(col("rk") <= col("r"), 1L).otherwise(0L))
          .as("draw_count"))
      .withColumn("epochs",
        round(col("draw_count").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** Oracle twin: the frozen (source, n_docs, w) integers ride the
    * SQL as VALUES literals (the P1/P2 frozen-model convention), so
    * DuckDB never evaluates pow — cross-engine libm ulps cannot flip
    * a micro-weight. */
  def mixTemperatureSql: String = {
    val m = tempWeightCache.oracleModel()
    val rows = m.map { case (s, n, w) =>
      s"('${s.replace("'", "''")}', CAST($n AS BIGINT), CAST($w AS BIGINT))"
    }.mkString(",\n        ")
    s"""WITH w(source, n_docs, w) AS (VALUES
      |        $rows),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot,
      |               CAST(sum(n_docs) AS BIGINT) AS b FROM w),
      |alloc AS (SELECT source, n_docs, w, b, w_tot,
      |            (b * w) // w_tot AS base, (b * w) % w_tot AS rem
      |          FROM w, tot),
      |lef AS (SELECT CAST(min(b) - sum(base) AS BIGINT) AS r FROM alloc),
      |rk AS (SELECT source,
      |         row_number() OVER (ORDER BY rem DESC, source) AS rk
      |       FROM alloc)
      |SELECT a.source, a.n_docs,
      |  round(CAST(a.w AS DOUBLE) / $TempWScale, 6) AS weight,
      |  CAST(a.base + CASE WHEN rk.rk <= lef.r THEN 1 ELSE 0 END AS BIGINT)
      |    AS draw_count,
      |  round(CAST(a.base + CASE WHEN rk.rk <= lef.r THEN 1 ELSE 0 END
      |        AS DOUBLE) / a.n_docs, 6) AS epochs
      |FROM alloc a, lef, rk
      |WHERE rk.source = a.source
      |ORDER BY a.source""".stripMargin
  }
}
