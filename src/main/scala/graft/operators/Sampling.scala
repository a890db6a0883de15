package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Corpus sampling/profiling operators (G1-G2) — the subsetting and
  * data-profiling steps of a training-data pipeline.
  *
  * Sampling is HASH-deterministic (md5 of key+salt), not RNG-based:
  * the same doc is always in or out regardless of partitioning,
  * executor count, or engine — reproducible experiment subsets and an
  * exact DuckDB oracle. Selection is a narrow per-row predicate; no
  * shuffle at any scale.
  */
object Sampling {

  /** Salted 16-bit hash bucket of a key column: first 4 hex digits of
    * md5(key || ":" || salt) as a long in [0, 65536). The primitive
    * under every deterministic split in the pipeline (sampling,
    * benchmark probe sets, incremental batches) — value-hash based, so
    * membership is stable under repartitioning and identical on any
    * engine with md5. */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 4), 16, 10)
      .cast("long")

  /** DuckDB twin of [[hashBucket]]; no base-conv there, so the 4
    * nibbles are decoded positionally. `key` must be a column name or
    * parenthesized expression. */
  def hashBucketSql(key: String, salt: String): String = {
    val h = s"md5($key || ':$salt')"
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substring($h, $i, 1)) - 1)"
    s"CAST(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)} AS BIGINT)"
  }

  /** Bucket threshold for a ~pct% sample. */
  def pctThreshold(pct: Int): Int = 65536 * pct / 100

  /** Loud cap on sample frames destined for a rank window whose sort
    * lands in one task (cut-point samples in CharLm's S2/R5): a
    * 25%-of-corpus sample bar is fine at test SFs but at 100 TB a
    * single-task sort of it is a silent scale-killer. Sized to what
    * one task sorts comfortably (~tens of MB at the 16-24 B/row
    * cut-sample grain); corpora past it must shrink the sample bar
    * (the published practice — cut-point precision needs a bounded
    * sample, not a fraction). */
  val SampleSortCap = 4000000L

  /** In-plan guard (the Boilerplate HotSetCap discipline): crossJoin
    * the sample with a broadcast 1-row count that `raise_error`s when
    * the sample exceeds `cap`. The broadcast side materializes BEFORE
    * the downstream window's sort executes, so an oversized sample
    * fails the job loudly instead of silently single-task-sorting.
    * Adds an `n_samp` column (callers may reuse it as the window's
    * total-count — it saves a count-over-frame window pass). */
  def sampleSortGuard(samp: DataFrame, cap: Long, what: String): DataFrame = {
    val n = samp.agg(count(lit(1)).as("n_samp"))
      .select(
        when(col("n_samp") <= cap, col("n_samp"))
          .otherwise(raise_error(concat(
            lit(s"$what sample "), col("n_samp").cast("string"),
            lit(s" rows exceeds single-sort cap $cap — shrink the sample bar"))))
          .as("n_samp"))
    samp.crossJoin(broadcast(n))
  }

  /** G1: ~`pct`% per language (stratified): keep docs whose salted
    * md5's first 4 hex digits fall under pct% of 16^4. Being
    * value-hash based, the sample is stable under repartitioning and
    * identical on any engine with md5. */
  def hashSample(spark: SparkSession, dir: String, pct: Int = 10,
                 salt: String = "graft"): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket(col("doc_id"), salt))
      .where(col("bucket") < pctThreshold(pct))
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy("doc_id")

  def hashSampleSql(pct: Int = 10, salt: String = "graft"): String =
    s"""SELECT doc_id, lang, source, bucket FROM (
      |  SELECT doc_id, lang, source,
      |    ${hashBucketSql("doc_id", salt)} AS bucket
      |  FROM documents) s
      |WHERE bucket < ${pctThreshold(pct)}
      |ORDER BY doc_id""".stripMargin

  /** G2: per-source corpus profile — the triage table a pipeline
    * operator reads before deciding what to keep. One shuffle on the
    * low-cardinality source key, all aggregates algebraic. */
  def sourceProfile(spark: SparkSession, dir: String): DataFrame = {
    val D = DecimalType(18, 2)
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars").cast(D)).cast("double").as("total_chars"))
      .orderBy("source")
  }

  val sourceProfileSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT lang) AS n_langs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS total_chars
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- H10
  /** Source-mix resampling — the data-mixing step of a training
    * pipeline: bring every source to (at most) the uniform target
    * share by deterministic hash thresholding. Each source's keep-rate
    * is `min(1, (N/S)/n_s)` (over-represented sources downsample,
    * small ones pass through); membership is the salted hash bucket,
    * so the mix is reproducible under repartitioning and identical on
    * both engines. Threshold arithmetic is int-derived double math —
    * same operation order in the oracle. Scale shape: one count
    * aggregation on the low-cardinality source key, the per-source
    * thresholds broadcast back, then a narrow filter. */
  def mixResample(spark: SparkSession, dir: String,
                  salt: String = "mix"): DataFrame =
    mixResampleFrom(Tables.documents(spark, dir), salt)

  /** [[mixResample]] over an arbitrary (doc_id, source, ...) frame —
    * the composable form: rates derive from THIS frame's source
    * counts, so resampling a funnel's survivor set balances the
    * survivors, not the raw corpus. */
  def mixResampleFrom(docs: DataFrame, salt: String = "mix"): DataFrame = {
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val totals = docs.agg(count(lit(1)).as("n_total"),
      countDistinct(col("source")).as("n_sources"))
    val thr = perSource.crossJoin(broadcast(totals))
      .select(col("source"),
        expr("CAST(floor(least(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_s)" +
          " * 65536) AS BIGINT)").as("thr"))
    docs.select(col("doc_id"), col("source"),
      hashBucket(col("doc_id"), salt).as("bucket"))
      .join(broadcast(thr), "source")
      .where(col("bucket") < col("thr"))
      .select(col("doc_id"), col("source"), col("bucket"), col("thr"))
      .orderBy("doc_id")
  }

  def mixResampleSql(salt: String = "mix"): String =
    s"""WITH t AS (
      |  SELECT count(*) AS n_total, count(DISTINCT source) AS n_sources
      |  FROM documents),
      |thr AS (
      |  SELECT source,
      |    CAST(floor(least(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_s)
      |      * 65536) AS BIGINT) AS thr
      |  FROM (SELECT source, count(*) AS n_s FROM documents GROUP BY 1) p, t)
      |SELECT d.doc_id, d.source, ${hashBucketSql("d.doc_id", salt)} AS bucket, thr.thr
      |FROM documents d JOIN thr ON d.source = thr.source
      |WHERE ${hashBucketSql("d.doc_id", salt)} < thr.thr
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- P3
  /** P3: UniMax epoch-capped source mixing (Chung et al. 2023) — the
    * published successor to temperature/uniform mixing (H10): given a
    * total training budget of T document draws and an epoch cap E, no
    * source repeats more than E times, and the budget left after
    * capping the small sources spreads UNIFORMLY over the rest. H10
    * can only downsample toward uniform; UniMax also OVERSAMPLES
    * small high-quality sources (up to the cap) — the regime
    * multilingual/code mixes actually train in.
    *
    * The waterfill is CLOSED-FORM over the per-source counts: sort
    * sources ascending by capacity e_s = E·n_s; the capped set is a
    * prefix (if a source's capacity is under its uniform share, every
    * smaller one's is too — induction on the running remainder), so
    * one window pass computes it: capped_s ⟺ e_s·(S−i+1) ≤ T −
    * cum_prev_s, then a = e (capped) or (T − Σcapped) DIV (S−k)
    * (uncapped; integer division, the ≤S−k leftover draws dropped).
    * ALL-INTEGER — both engines agree exactly.
    *
    * Materialization is deterministic: source s emits a_s draws as
    * `a DIV n` full copies of every doc plus one extra copy for the
    * `a MOD n` docs ranking first by salted hash (a WindowGroupLimit-
    * shape rank) — so `n_copies` is a pure function of the corpus.
    * Scale: two source-cardinality aggregations + windows over
    * #sources rows + one broadcast join back; the corpus side is one
    * narrow pass. Output: every doc with its draw count (0 allowed —
    * the weight table a shard-packer or K2 sampler consumes). */
  val UniMaxEpochCap = 4
  /** T = factor × corpus docs — a 3× oversampling budget, the regime
    * where the epoch cap actually binds on small sources. */
  val UniMaxBudgetFactor = 3

  def mixUnimax(spark: SparkSession, dir: String,
                salt: String = "unimax"): DataFrame =
    mixUnimaxFrom(Tables.documents(spark, dir), salt)

  def mixUnimaxFrom(docs: DataFrame, salt: String = "unimax"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val tot = docs.agg((count(lit(1)) * UniMaxBudgetFactor).as("t"))
    val wOrd = Window.orderBy(col("e"), col("source"))
    val wAll = Window.partitionBy() // whole frame: #sources rows
    val alloc = src
      .select(col("source"), col("n"), (col("n") * UniMaxEpochCap).as("e"))
      .crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(wOrd))
      .withColumn("s_total", count(lit(1)).over(wAll))
      .withColumn("cum_prev",
        coalesce(sum("e").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("capped",
        col("e") * (col("s_total") - col("i") + 1) <= col("t") - col("cum_prev"))
      .withColumn("k", sum(when(col("capped"), 1).otherwise(0)).over(wAll))
      .withColumn("capped_sum",
        coalesce(sum(when(col("capped"), col("e"))).over(wAll), lit(0L)))
      .withColumn("a", when(col("capped"), col("e"))
        .otherwise(expr("(t - capped_sum) DIV (s_total - k)")))
      .select(col("source"), col("n"), col("a"))
    // Materialization rank, TWO-LEVEL (the H11/PrefixSum discipline —
    // a plain Window.partitionBy(source) would sort each source's
    // ENTIRE doc set in one task, and at 100 TB a dominant crawl
    // source is most of the corpus). The extra-copy rule needs only
    // `rk <= m` (m = a MOD n), so whole hash-prefix buckets decide by
    // COUNTS alone: bucket `bkt` = first two nibbles of the salted
    // hash (a PREFIX of the sort key, so bucket order refines
    // (hash, doc_id) order); per-(source, bkt) counts → exclusive
    // offsets over a sources×256-row frame; a bucket wholly under m
    // is all-extra, wholly past m is none, and ONLY the single
    // straddling bucket per source (~n/256 rows) gets an intra-bucket
    // row_number. Output is identical to the single-window rank.
    val base = docs.select(col("doc_id"), col("source"),
        hashBucket(col("doc_id"), salt).as("hb"))
      .withColumn("bkt", expr("hb DIV 256"))
    val wOff = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bmeta = base.groupBy("source", "bkt").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum("c").over(wOff), lit(0L)))
      .join(alloc, Seq("source"))
      .withColumn("m", expr("a % n"))
    val marked = base.join(broadcast(bmeta), Seq("source", "bkt"))
    val outCols = Seq(col("doc_id"), col("source"),
      (expr("a DIV n") + col("extra")).as("n_copies"))
    val easy = marked
      .where(col("off") + col("c") <= col("m") || col("off") >= col("m"))
      .withColumn("extra",
        when(col("off") + col("c") <= col("m"), 1L).otherwise(0L))
      .select(outCols: _*)
    val wIntra = Window.partitionBy("source", "bkt")
      .orderBy(col("hb"), col("doc_id"))
    val straddle = marked
      .where(col("off") + col("c") > col("m") && col("off") < col("m"))
      .withColumn("extra",
        when(col("off") + row_number().over(wIntra) <= col("m"), 1L)
          .otherwise(0L))
      .select(outCols: _*)
    easy.unionByName(straddle).orderBy("doc_id")
  }

  def mixUnimaxSql(salt: String = "unimax"): String =
    s"""WITH tot AS (SELECT count(*) * $UniMaxBudgetFactor AS t FROM documents),
      |src AS (SELECT source, count(*) AS n, count(*) * $UniMaxEpochCap AS e
      |        FROM documents GROUP BY 1),
      |w AS (
      |  SELECT source, n, e, t,
      |    row_number() OVER (ORDER BY e, source) AS i,
      |    count(*) OVER () AS s_total,
      |    coalesce(sum(e) OVER (ORDER BY e, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      |  FROM src, tot),
      |f AS (SELECT *, e * (s_total - i + 1) <= t - cum_prev AS capped FROM w),
      |alloc AS (
      |  SELECT source, n,
      |    CASE WHEN capped THEN e
      |         ELSE (t - (SELECT coalesce(sum(e) FILTER (WHERE capped), 0) FROM f))
      |              // (s_total - (SELECT count(*) FILTER (WHERE capped) FROM f))
      |    END AS a
      |  FROM f),
      |rk AS (
      |  SELECT d.doc_id, d.source, alloc.n, alloc.a,
      |    row_number() OVER (PARTITION BY d.source
      |      ORDER BY ${hashBucketSql("d.doc_id", salt)}, d.doc_id) AS rk
      |  FROM documents d JOIN alloc ON d.source = alloc.source)
      |SELECT doc_id, source,
      |  CAST(a // n + CASE WHEN rk <= a % n THEN 1 ELSE 0 END AS BIGINT)
      |    AS n_copies
      |FROM rk
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- H11
  /** Per-source token-budget packing — "give me ≤B estimated tokens
    * per source": docs are ordered by salted hash (a reproducible
    * shuffle), token counts accumulate per source, and the running sum
    * is cut at the budget. The token estimate is the E3 ceil(chars/4)
    * rule, integer-exact on both engines.
    *
    * Scale shape: a TWO-LEVEL prefix sum, not one window per source —
    * `Window.partitionBy(source)` would put EVERY row of a source into
    * a single task, and at 100 TB one crawl is often more than half
    * the corpus. Instead:
    *
    *  1. bucket each doc by the first two hex digits of its salted
    *     hash ([[TokenBudgetBuckets]] ordered ranges of the sort key —
    *     the bucket id is a PREFIX of `h`, so (bkt, h, doc_id) order
    *     IS (h, doc_id) order);
    *  2. aggregate per-(source, bucket) token sums (bounded output:
    *     sources × 256 rows) and turn them into per-bucket cumulative
    *     offsets with a window over that tiny frame;
    *  3. broadcast the offsets back, PRUNING buckets whose offset
    *     already exceeds the budget — the intra-bucket running sum
    *     then runs per (source, bucket), 256-way parallel per source,
    *     and only over buckets that can still emit rows (~B/avg_tokens
    *     docs per source survive the prune regardless of corpus size).
    *
    * `cum_tokens = offset + intra-bucket running sum` is exactly the
    * global per-source running sum, so the output (and the oracle) is
    * unchanged from the single-window form. */
  val TokenBudgetBuckets = 256

  /** The pre-window candidate frame of [[tokenBudget]]: docs in
    * buckets whose cumulative offset can still emit rows, each row
    * carrying its bucket's `offset`. Exposed for ScalingStats — its
    * row count is exactly what the final window sorts. */
  private[graft] def tokenBudgetCandidates(spark: SparkSession, dir: String,
                                           budget: Long, salt: String,
                                           tokenCounter: Option[Column] = None)
      : DataFrame =
    // shared machinery: PrefixSum builds the hash/bucket columns and
    // the per-(source, bucket) offsets (a <= sources x 256 row
    // window). The prune drops whole past-budget buckets BEFORE the
    // broadcast join — offset > budget means every row of the bucket
    // has cum > budget (est_tokens >= 0), so the final window sorts
    // only the few head buckets that can still emit.
    PrefixSum.withBucketOffsets(
      PrefixSum.hashedBase(Tables.documents(spark, dir), salt, Seq("source"),
        tokenCounter),
      Seq("source"),
      _.where(col("offset") <= budget))

  /** H11 under the LEARNED token counter (P1): the same two-level
    * prefix-sum plan with `est_tokens` swapped from the chars/4
    * heuristic to the trained BPE count — the flag the verdict asked
    * for, one Column at the single place the token unit is defined.
    * Test-verified (BpeSpec recomputes the cut driver-side); the
    * default [[tokenBudget]] keeps the heuristic and its oracle. */
  def tokenBudgetBpe(spark: SparkSession, dir: String,
                     budget: Long = 1000L, salt: String = "budget"): DataFrame =
    tokenBudgetWith(spark, dir, budget, salt,
      Some(Bpe.tokenCountCol(spark, Bpe.model(spark, dir))))

  def tokenBudget(spark: SparkSession, dir: String,
                  budget: Long = 1000L, salt: String = "budget"): DataFrame =
    tokenBudgetWith(spark, dir, budget, salt, None)

  private def tokenBudgetWith(spark: SparkSession, dir: String,
                              budget: Long, salt: String,
                              tokenCounter: Option[Column]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy("source", "bkt").orderBy(col("h"), col("doc_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    // coalesce the windowed sum: SQL SUM skips NULLs, so a null-text
    // row whose in-bucket prefix is all-null must get cum = offset
    // (exactly what the single-window form and the DuckDB oracle
    // produce), not a NULL cum that silently drops the row
    tokenBudgetCandidates(spark, dir, budget, salt, tokenCounter)
      .withColumn("cum_tokens",
        col("offset") + coalesce(sum(col("est_tokens")).over(wCum), lit(0L)))
      .where(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("est_tokens"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  def tokenBudgetSql(budget: Long = 1000L, salt: String = "budget"): String =
    s"""SELECT doc_id, source, est_tokens, cum_tokens FROM (
      |  SELECT doc_id, source, est_tokens,
      |    CAST(sum(est_tokens) OVER (PARTITION BY source
      |      ORDER BY md5(doc_id || ':$salt'), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens
      |  FROM (SELECT doc_id, source,
      |          coalesce(CAST(ceil(length(text) / 4.0) AS BIGINT), 0)
      |            AS est_tokens
      |        FROM documents) e) c
      |WHERE cum_tokens <= $budget
      |ORDER BY doc_id""".stripMargin

  /** H7: sketch-based profiling — approximate distinct users (HLL++)
    * and approximate value quantiles (Greenwald-Khanna) per event
    * route. At 100 TB this is the only affordable shape: both sketches
    * are constant-memory, merge in partial aggregation, and never
    * shuffle raw values the way exact count-distinct / percentile
    * must. Sketch internals are engine-specific by design, so there is
    * no DuckDB oracle for the raw estimates — PipelineOpsSpec asserts
    * each estimate against the exact answer (±2% distinct, ±5%
    * quantile rank); [[approxProfileAudit]] is the hash-gated form. */
  def approxProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsRaw(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99_value"))
      .orderBy("event_type")

  /** H7 under the hash gate: the sketch AUDIT — exact per-route stats
    * plus each sketch's error-bound verdict computed against the SAME
    * engine's exact answer. Raw sketch estimates can never hash-match
    * across engines (HLL++/GK here vs HLL/t-digest in DuckDB), but
    * their CONTRACTS can: each engine runs its own sketch and its own
    * exact aggregate, and the within-bounds boolean — distinct count
    * within ±5%, p50 inside the exact [p45, p55], p99 inside
    * [p98.5, p99.5] — is deterministic on both sides. The sketches
    * stay genuinely exercised under the driver gate; the raw-estimate
    * error-bound spec in PipelineOpsSpec is unchanged. */
  def approxProfileAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsRaw(spark, dir)
    // Two aggregations, joined on the ≤#routes key, NOT one combined
    // agg: countDistinct plans through an Expand whose distinct arm
    // regroups by (event_type, user_id) — corpus-cardinality keys that
    // drag every percentile OBJECT buffer past the hash-aggregate
    // fallback threshold into sort-based aggregation (measured 4.8 s
    // of this query's 5.9 s at sf0.1). Split, the sketch/percentile
    // agg keeps #routes groups in a hash table and the distinct count
    // runs as a plain codegen two-phase aggregate. The percentile
    // calls collapse to the array forms — one buffer per family
    // instead of four/two, bit-identical values (same accumulator
    // state, queried at several points).
    val sketches = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_events"),
      approx_count_distinct(col("user_id"), 0.02).as("au"),
      percentile_approx(col("value"), array(lit(0.5), lit(0.99)),
        lit(10000)).as("pa"),
      expr("percentile(value, array(0.45, 0.55, 0.985, 0.995))").as("pe"))
    // null-safe join key (<=>): the single-agg form this split
    // replaced kept a NULL event_type group (as does the oracle's
    // GROUP BY) — an inner equi-join would silently drop it if events
    // ever carried null event_type (the schema field is nullable)
    val users = ev.groupBy(col("event_type").as("event_type_u"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    sketches.join(users, col("event_type") <=> col("event_type_u"))
      .drop("event_type_u")
      .select(col("event_type"), col("n_events"), col("n_users"),
        (abs(col("au") - col("n_users")) <= col("n_users") * 0.05)
          .as("users_sketch_ok"),
        (element_at(col("pa"), 1) >= element_at(col("pe"), 1) &&
          element_at(col("pa"), 1) <= element_at(col("pe"), 2))
          .as("p50_sketch_ok"),
        (element_at(col("pa"), 2) >= element_at(col("pe"), 3) &&
          element_at(col("pa"), 2) <= element_at(col("pe"), 4))
          .as("p99_sketch_ok"))
      .orderBy("event_type")
  }

  /** DuckDB twin of [[approxProfileAudit]]: DuckDB's own sketches
    * (HLL approx_count_distinct, t-digest approx_quantile) audited
    * against DuckDB's own exact aggregates — only the verdict
    * booleans and exact counts are compared across engines. */
  def approxProfileAuditSql: String =
    s"""SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
      |    <= 0.05 * count(DISTINCT user_id) AS users_sketch_ok,
      |  approx_quantile(value, 0.5) BETWEEN quantile_cont(value, 0.45)
      |    AND quantile_cont(value, 0.55) AS p50_sketch_ok,
      |  approx_quantile(value, 0.99) BETWEEN quantile_cont(value, 0.985)
      |    AND quantile_cont(value, 0.995) AS p99_sketch_ok
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- J5
  /** 98/1/1 split boundaries on the 16-bit bucket space, integer
    * arithmetic only (65536·98/100 = 64225, ·99/100 = 64880) — no
    * float rounding to disagree across engines. */
  val TrainThreshold: Int = 65536 * 98 / 100
  val ValThreshold: Int = 65536 * 99 / 100

  /** J5: deterministic train/val/test assignment — the holdout split
    * of a training pipeline as a per-row VALUE-HASH property, not an
    * RNG draw: a doc's split is a pure function of its id, so the
    * assignment survives repartitioning, incremental corpus growth
    * (new docs land in splits at the same rates; old docs never
    * move), and re-runs on any engine — the property that keeps eval
    * contamination impossible across pipeline versions. Salting the
    * hash ("holdout") makes the split independent of every OTHER
    * hash-derived decision in the pipeline (G1 sampling, H10/H11
    * thresholds, I1 shard order): membership in a sample and
    * membership in val/test are uncorrelated bits.
    *
    * Scale shape: one narrow codegen'd projection — no shuffle, no
    * state, no split manifest to keep consistent; 100 TB assignment
    * is a map pass that fuses into whatever scan follows it. */
  def splitAssign(spark: SparkSession, dir: String,
                  salt: String = "holdout"): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        splitOf(col("doc_id"), salt).as("split"))
      .orderBy("doc_id")

  /** The J5 split as a reusable per-row rule (any consumer that joins
    * docs to their split — e.g. N1's leakage audit — derives it from
    * the id instead of materializing the assignment table). */
  def splitOf(key: Column, salt: String = "holdout"): Column = {
    val b = hashBucket(key, salt)
    when(b < TrainThreshold, "train")
      .when(b < ValThreshold, "val")
      .otherwise("test")
  }

  /** DuckDB twin of [[splitOf]]. */
  def splitOfSql(key: String, salt: String = "holdout"): String =
    s"""CASE WHEN ${hashBucketSql(key, salt)} < $TrainThreshold THEN 'train'
      |     WHEN ${hashBucketSql(key, salt)} < $ValThreshold THEN 'val'
      |     ELSE 'test' END""".stripMargin

  def splitAssignSql(salt: String = "holdout"): String =
    s"""SELECT doc_id, source,
      |  CASE WHEN bucket < $TrainThreshold THEN 'train'
      |       WHEN bucket < $ValThreshold THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, source,
      |        ${hashBucketSql("doc_id", salt)} AS bucket
      |      FROM documents) s
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- K2
  /** Per-source quota for the weighted sample. */
  val WeightedK = 20

  /** K2: deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): each doc draws key = -ln(u)/w from a
    * hash-derived uniform u and its weight w (here `n_chars` — the
    * "prefer longer/higher-quality docs" dial); the k smallest keys
    * per source are exactly a weighted sample without replacement.
    * Hash-determinism extends G1's contract to the weighted case: the
    * inclusion set is a pure function of (doc_id, salt, weights), so
    * reruns, repartitions, and engines agree row-for-row, and the
    * "weighted" salt keeps the draw independent of G1 sampling and
    * J5 split membership.
    *
    * u = (bucket16 + 0.5) / 65536 — strictly inside (0, 1), so the
    * log never sees 0 (Spark `log` returns NULL there, DuckDB errors;
    * the half-step sidesteps both) and both engines evaluate the
    * identical double expression.
    *
    * Scale shape: key is a narrow per-row projection; per-source
    * top-k is `row_number() <= k`, which rewrites to WindowGroupLimit
    * — each map task forwards at most k candidate rows per source to
    * the exchange (I2's skew-immune quota shape), so the shuffle
    * moves O(sources·k·tasks) rows at any corpus size. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = WeightedK,
                     salt: String = "weighted"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (hashBucket(col("doc_id"), salt).cast("double") + 0.5) / 65536.0
    val w = Window.partitionBy("source")
      .orderBy(col("es_key").asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("es_key", -log(u) / col("n_chars"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("rank").cast("long").as("rank"))
      .orderBy("source", "rank")
  }

  /** P5: the O2→K2 production composition, PINNED as a query instead
    * of claimed in prose: sample k training docs per source by A-ES
    * over the SOFT-DEDUP weights — each duplicate cluster's surviving
    * rep competes with sampling weight c^0.5, so repeated content is
    * boosted sublinearly exactly as O2 prescribes, and the sample is
    * hash-deterministic like every other membership decision. Scale
    * shape: O2's signature aggregation + one doc_id equi-join to
    * recover the rep's source + K2's WindowGroupLimit top-k. */
  def softWeightedSample(spark: SparkSession, dir: String,
                         k: Int = WeightedK,
                         salt: String = "softw"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val u = (hashBucket(col("doc_id"), salt).cast("double") + 0.5) / 65536.0
    val w = Window.partitionBy("source")
      .orderBy(col("es_key").asc, col("doc_id").asc)
    Dedup.softDedupFrom(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("es_key", -log(u) / col("weight"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("n_copies"), col("weight"),
        col("rank").cast("long").as("rank"))
      .orderBy("source", "rank")
  }

  def softWeightedSampleSql(k: Int = WeightedK,
                            salt: String = "softw"): String =
    s"""WITH soft AS (
      |  SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
      |    round(pow(CAST(count(*) AS DOUBLE), ${Dedup.SoftAlpha}), 6) AS weight
      |  FROM (SELECT doc_id, ${graft.functions.Portable.bagSignatureSql("text")} AS sig
      |        FROM documents) t
      |  GROUP BY sig),
      |j AS (
      |  SELECT s.doc_id, d.source, s.n_copies, s.weight,
      |    -ln((CAST(${hashBucketSql("s.doc_id", salt)} AS DOUBLE) + 0.5)
      |        / 65536.0) / s.weight AS es_key
      |  FROM soft s JOIN documents d ON s.doc_id = d.doc_id)
      |SELECT doc_id, source, n_copies, weight, rank FROM (
      |  SELECT doc_id, source, n_copies, weight,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY es_key ASC, doc_id ASC) AS rank
      |  FROM j) r
      |WHERE rank <= $k
      |ORDER BY source, rank""".stripMargin

  def weightedSampleSql(k: Int = WeightedK, salt: String = "weighted"): String =
    s"""SELECT doc_id, source, n_chars, rank FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY es_key ASC, doc_id ASC) AS rank
      |  FROM (SELECT doc_id, source, n_chars,
      |          -ln((CAST(${hashBucketSql("doc_id", salt)} AS DOUBLE) + 0.5)
      |              / 65536.0) / n_chars AS es_key
      |        FROM documents) t) r
      |WHERE rank <= $k
      |ORDER BY source, rank""".stripMargin

  // ---------------------------------------------------------------- U6
  /** U6: split-balance audit \u2014 the measurement half of J5: per split,
    * the Pearson chi-square statistic of its observed source
    * composition against the global source mix (expected cell count
    * e = n_split\u00b7n_src/N). A value-hash split is balanced only in
    * EXPECTATION; this is the check a pipeline runs before trusting a
    * 1%% validation slice to represent the corpus \u2014 a large chi2 on
    * val/test means per-source eval numbers will be noise. Dense over
    * the literal split ladder \u00d7 observed sources, so an empty split
    * (tiny corpus) reads n_docs 0 / chi2 0 in both engines rather
    * than vanishing.
    *
    * Scale shape: the J5 assignment is a narrow codegen projection
    * fused into the scan; the only corpus-scale stage is the
    * (split, source) cell count (map-side combined); the cell frame
    * is bounded (|splits|\u00b7|sources|) and localCheckpoint-cut for its
    * THREE consumers (marginals \u00d7 2 + cells); everything after is
    * bounded-row arithmetic with exact integer products divided once
    * (n_split\u00b7n_src exact in BIGINT, ONE double division). */
  def splitBalance(spark: SparkSession, dir: String): DataFrame =
    splitBalanceFromAssigned(spark,
      Tables.documents(spark, dir)
        .select(col("source"), splitOf(col("doc_id")).as("split")))

  def splitBalanceFromAssigned(spark: SparkSession,
                               assigned: DataFrame): DataFrame = {
    import spark.implicits._
    val cell = assigned.groupBy("split", "source")
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // bounded |splits|\u00b7|sources|, three consumers
    val bySrc = cell.groupBy("source").agg(sum("o").as("n_src"))
    val bySplit = cell.groupBy("split").agg(sum("o").as("n_split"))
    val nTot = cell.agg(sum("o").as("n_total"))
    val dense = bySrc
      .crossJoin(broadcast(Seq("train", "val", "test").toDF("split")))
      .join(broadcast(bySplit), Seq("split"), "left")
      .join(broadcast(cell.select("split", "source", "o")),
        Seq("split", "source"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("split"), col("source"), col("n_src"),
        coalesce(col("n_split"), lit(0L)).as("n_split"),
        coalesce(col("o"), lit(0L)).as("o"), col("n_total"))
    val e = (col("n_split") * col("n_src")).cast("double") / col("n_total")
    val term = when(e === 0.0, lit(0.0))
      .otherwise(pow(col("o").cast("double") - e, 2) / e)
    dense.groupBy("split")
      .agg(max("n_split").as("n_docs"), round(sum(term), 6).as("chi2"))
      .orderBy("split")
  }

  /** U6's twin \u2014 same dense grid and guards. */
  def splitBalanceSql: String =
    s"""WITH a AS (
      |  SELECT source, ${splitOfSql("doc_id").replace("\n", " ")} AS split
      |  FROM documents),
      |cell AS (SELECT split, source, CAST(count(*) AS BIGINT) AS o
      |         FROM a GROUP BY split, source),
      |bysrc AS (SELECT source, CAST(sum(o) AS BIGINT) AS n_src
      |          FROM cell GROUP BY source),
      |bysplit AS (SELECT split, CAST(sum(o) AS BIGINT) AS n_split
      |            FROM cell GROUP BY split),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cell),
      |dense AS (
      |  SELECT s.split, b.source, b.n_src,
      |    coalesce(bs.n_split, 0) AS n_split,
      |    coalesce(cell.o, 0) AS o, tot.n_total
      |  FROM bysrc b
      |  CROSS JOIN (VALUES ('train'), ('val'), ('test')) s(split)
      |  LEFT JOIN bysplit bs ON bs.split = s.split
      |  LEFT JOIN cell ON cell.split = s.split AND cell.source = b.source
      |  CROSS JOIN tot)
      |SELECT split, CAST(max(n_split) AS BIGINT) AS n_docs,
      |  round(sum(CASE
      |    WHEN n_split * n_src = 0 THEN 0
      |    ELSE pow(CAST(o AS DOUBLE)
      |           - CAST(n_split * n_src AS DOUBLE) / n_total, 2)
      |         / (CAST(n_split * n_src AS DOUBLE) / n_total)
      |  END), 6) AS chi2
      |FROM dense
      |GROUP BY split
      |ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- W1
  /** GPT-3's Pareto shape parameter (Brown et al. 2020, appendix A). */
  val ParetoAlpha = 9
  private val paretoSalt = "pareto"

  /** W1: GPT-3 quality-score Pareto sampling (Brown et al. 2020,
    * appendix A): keep a document iff a Pareto(α=9) draw exceeds
    * `1 − score` — high-quality docs are kept almost surely, low
    * quality docs survive with small probability, so the kept corpus
    * is quality-TILTED rather than hard-thresholded (the published
    * softness L1's adaptive gate lacks). The randomness is G1's salted
    * hash uniform, so membership is a pure function of doc_id —
    * reproducible, stable under repartitioning, identical on any
    * engine with md5.
    *
    * Exactness: `pareto > 1 − s` with pareto = (1−u)^(−1/α) − 1
    * rearranges (both sides positive, α integer) to
    * `(1−u)·(2−s)^α < 1`. (2−s)^9 is evaluated as an EXPLICIT
    * square-and-multiply chain (b²,b⁴,b⁸,b⁸·b) — plain IEEE
    * multiplies in a pinned order on both engines — so no libm pow()
    * ulp can flip a keep decision; u = bucket/2¹⁶ is exact dyadic.
    * Scale shape: one narrow scan, no shuffle, no state. */
  def paretoSample(spark: SparkSession, dir: String): DataFrame =
    paretoSampleFrom(Tables.documents(spark, dir))

  def paretoSampleFrom(docs: DataFrame): DataFrame =
    paretoVerdicts(docs).orderBy("doc_id")

  /** Sort-free form — stateless per-row (hash uniform + multiply
    * chain), so it is also the streaming ingest-gate form (pinned in
    * StreamingRuleGateSpec). */
  def paretoVerdicts(docs: DataFrame): DataFrame = {
    val s = TextAnalysis.qualityScore(col("text"))
    val u = hashBucket(col("doc_id"), paretoSalt).cast("double") / 65536.0
    val b = lit(2.0) - s
    val b2 = b * b
    val b4 = b2 * b2
    val b8 = b4 * b4
    val b9 = b8 * b
    val margin = (lit(1.0) - u) * b9
    docs.select(col("doc_id"),
      round(s, 6).as("quality_score"),
      hashBucket(col("doc_id"), paretoSalt).as("u_bucket"),
      round(margin, 6).as("pareto_margin"),
      (margin < 1.0).as("keep"))
  }

  def paretoSampleSql: String = {
    val s = TextAnalysis.qualityScoreSql("text")
    val hb = hashBucketSql("CAST(doc_id AS VARCHAR)", paretoSalt)
    s"""WITH q AS (
      |  SELECT doc_id, $s AS s, $hb AS ub FROM documents),
      |c AS (
      |  SELECT doc_id, s, ub,
      |    (2.0 - s) AS b, ((2.0 - s) * (2.0 - s)) AS b2
      |  FROM q),
      |c2 AS (SELECT *, (b2 * b2) AS b4 FROM c),
      |c3 AS (SELECT *, (b4 * b4) AS b8 FROM c2),
      |m AS (
      |  SELECT doc_id, s, ub,
      |    ((1.0 - CAST(ub AS DOUBLE) / 65536.0) * (b8 * b)) AS margin
      |  FROM c3)
      |SELECT doc_id, round(s, 6) AS quality_score, ub AS u_bucket,
      |  round(margin, 6) AS pareto_margin, (margin < 1.0) AS keep
      |FROM m ORDER BY doc_id""".stripMargin
  }
}
