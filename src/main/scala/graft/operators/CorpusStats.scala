package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.sources.Tables

/** Corpus-level text statistics that need a global view — signals no
  * per-row pass can compute.
  */
object CorpusStats {

  /** Word n-gram width for the duplicate-passage signal. Published
    * corpus-dedup work flags ~50-token repeated substrings; on this
    * synthetic corpus (docs of ~30-100 tokens) 5-grams are the
    * proportionate choice, and the width is a literal in both the
    * plan and the oracle so changing it cannot desynchronize them. */
  private val DupGramN = 5

  /** I3: per-document duplicate n-gram fraction — for each doc, the
    * share of its distinct word 5-grams that also occur in at least
    * one OTHER document. The corpus-wide complement of
    * [[TextAnalysis.repetition]] (which scores repetition INSIDE a
    * doc): boilerplate, templated text, and cross-document near-copy
    * passages score high even when each individual doc looks clean.
    * This is the repeated-passage signal from published training-data
    * dedup work, computed exactly.
    *
    * Plan shape: one narrow fused gram build
    * ([[graft.plans.Shingles]]) feeding TWO aggregations that shuffle
    * on the SAME key (gram): the count side collapses map-side to one
    * row per distinct gram per task before its exchange, and the join
    * back is co-partitioned (both exchanges hash on `gram`) so the
    * per-doc re-aggregation is the only other shuffle (on doc_id).
    * Grams are distinct per doc, so `count(*)` per gram IS the
    * distinct-document frequency — no count-distinct needed.
    *
    * At 100 TB: this is the one operator whose shuffle is a multiple
    * of the corpus size (~|tokens| gram rows). Grams never appear in
    * the OUTPUT — only their frequencies do — so both exchanges ship
    * `xxhash64(gram)` (8 B fixed) instead of the ~40 B gram string:
    * measured 8.0 → 3.1 s on the 10× corpus, and at scale the shuffle
    * is ~5× lighter with integer-key joins. A 64-bit collision would
    * merge two gram groups (over-counting duplication). Headroom,
    * measured rather than assumed (ScalingStats `dupfrac`): distinct
    * grams are 47.6/doc, exactly linear through the 10× corpus
    * (237,849 → 2,378,490 for 5k → 50k docs), so a 100 TB corpus
    * holds m ≈ 10¹²–10¹³ distinct grams — far past the 2³²
    * one-collision birthday point, and the right question is HOW MANY:
    * expected colliding pairs = m²/2⁶⁵ ≈ 2.7·10⁴ at m=10¹² (2.7·10⁶
    * at 10¹³), i.e. ~10⁻⁷ of gram groups merged — noise for a
    * fraction-valued signal, orders below the estimator's own
    * tokenizer sensitivity. DECISION: keep the 8 B key; the 2× wider
    * shuffle a 128-bit key costs (two salted xxhash64 columns — the
    * documented widening if an EXACT gram-set use ever needs it) buys
    * nothing measurable here. The corpus-parity gate vs the raw-string
    * DuckDB oracle would surface a fixture-scale collision; the
    * remaining published mitigation — widening the gram — is the
    * `DupGramN` knob. A pathologically hot gram (empty string,
    * boilerplate) lands on one reducer for the count side — partial
    * agg bounds that at one row per task — and AQE's skew-join split
    * covers the join-back side (AqeSkewSpec proves the mechanism). */
  def dupGramFrac(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(spark, Tables.documents(spark, dir))
    def sh = Vectors.shinglesFast(spark, col("text"), DupGramN,
      distinct = true)
    // n_grams is a NARROW per-doc property (the distinct-shingle array
    // length) — the round-19 form re-derived it by counting every
    // exploded occurrence through a corpus-wide grams⋈freq sort-merge
    // join, which at the organic 1000× probe OOM'd 32 concurrent
    // tasks' sort pages (BASELINE round-20). Only the DUP side needs a
    // join, and dup occurrences are ~10% of all occurrences (measured
    // sf0.1), so the J6 bloom prune sheds the other ~90% inside the
    // probe's scan stage and both SMJ sorts shrink to the dup slice.
    val nGrams = docs.select(col("doc_id"), size(sh).cast("long").as("n_grams"))
    val grams = docs.select(col("doc_id"), explode(sh).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gram"))
    // the corpus-global dup definition keeps its one aggregation
    // shuffle (partial-agg'd, hash-spillable); localCheckpoint stores
    // the bounded dup-key frame once so the bloom build and the exact
    // semi join don't each re-run the aggregation lineage
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > 1)
      .select(col("gram").as("dup_gram"))
      .localCheckpoint()
    // bloom sized to the ACTUAL dup-key count (cheap: dup is
    // checkpointed) — a fixed 2^23 sizing embedded a 7.3 MB literal
    // in every task binary even when 12k keys needed ~14 KB
    val nDup = BloomJoin.bloomPrunedSemi(spark, grams, "gram",
        dup, "dup_gram", expectedItems = math.max(dup.count(), 1024L))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    nGrams.join(nDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac", col("n_dup").cast("double") / col("n_grams"))
      .orderBy("doc_id")
  }

  /** I5: corpus-wide top-k n-grams by DOCUMENT frequency — the
    * boilerplate report. Published web-corpus curation removes the
    * most document-frequent passages (headers, footers, templates);
    * this surfaces them. Distinct-per-doc grams make `count(*)` the
    * document frequency directly.
    *
    * Scale shape: one gram-key aggregation (map-side partial agg
    * collapses each task's distinct grams first) followed by a
    * `TakeOrderedAndProject` — k rows per partition cross the wire,
    * never a full sort. Here the gram STRING is the output, so the
    * exchange carries strings; the partial agg means it carries each
    * task's DISTINCT grams once, not every occurrence. Ties break by
    * gram text, so the report is deterministic across engines
    * (ASCII-lowercase corpus: Spark binary UTF8 order == DuckDB
    * collation). */
  def topGrams(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    Tables.parallelized(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        explode(Vectors.shinglesFast(spark, col("text"), DupGramN,
          distinct = true)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(k)
  }

  def topGramsSql(k: Int = 20): String =
    s"""WITH s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(toks)-${DupGramN - 2}, 2)),
      |      i -> array_to_string(toks[i:i+${DupGramN - 1}], ' '))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |g AS (SELECT doc_id, unnest(sh) AS gram FROM s)
      |SELECT gram, count(*) AS n_docs FROM g
      |GROUP BY gram
      |ORDER BY n_docs DESC, gram
      |LIMIT $k""".stripMargin

  /** DuckDB twin — same distinct 5-gram build as the Shingles
    * expression (single-space split keeping empty tokens,
    * end-truncated window, `max(T-n+1, 1)` grams). */
  val dupGramFracSql: String =
    s"""WITH s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(toks)-${DupGramN - 2}, 2)),
      |      i -> array_to_string(toks[i:i+${DupGramN - 1}], ' '))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
      |freq AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram)
      |SELECT g.doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN freq.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(sum(CASE WHEN freq.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS dup_frac
      |FROM g JOIN freq USING (gram)
      |GROUP BY g.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- K5
  /** Salient terms per doc for the report. */
  val TfIdfK = 3

  /** K5: per-document salient terms — tf·idf with the RATIONAL idf
    * variant `N/df` instead of `ln(N/df)`: the ranking signal is the
    * same (monotone up in tf, down in df) but the score is a single
    * IEEE division of integers, so both engines produce identical
    * bits and the cross-engine rank order is exact — no libm in the
    * compare path (`ln` differs in the last ulp across
    * implementations; a log-idf deployment would simply not
    * hash-compare its scores). Ties (same score) break by token text.
    *
    * Plan shape: the token explode is the corpus-×-tokens pass (I3's
    * class); tf collapses map-side on (doc_id, token); df is a second
    * agg on the SAME exchange key prefix; the df table is vocabulary-
    * sized — orders smaller than the corpus — so AQE broadcasts the
    * join back; the final per-doc quota is `row_number() <= k` →
    * WindowGroupLimit, the skew-immune top-k. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = TfIdfK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.parallelized(spark, Tables.documents(spark, dir))
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    tf.join(df, "token").crossJoin(n)
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("token"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  def tfidfTopTermsSql(k: Int = TfIdfK): String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      |  FROM tf JOIN df USING (token), n)
      |SELECT doc_id, rank, token, tf, df, score FROM (
      |  SELECT doc_id, token, tf, df, score,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score DESC, token ASC) AS rank
      |  FROM scored) r
      |WHERE rank <= $k
      |ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------- K5/K6 delta maintenance
  /** Doc-grain token-count state `(doc_id, source, token, c)` — the
    * maintainable form of the corpus-×-tokens explode that both K5
    * (tf·idf) and K6 (drift) open with. The explode is the expensive
    * stage at 100 TB (|tokens| ≈ 10²-10³ × |docs| rows); everything
    * downstream of this state is (doc, distinct-token)- or
    * vocabulary-scale. Keeping the state at DOC grain (not the
    * (source, token) grain K6 consumes) is what makes subtraction
    * possible: a departed doc's contribution is its own state rows,
    * removed by anti-join — no old text ever re-read. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "source", "token").agg(count(lit(1)).as("c"))

  /** L-series maintenance (the L4 pattern applied to corpus stats):
    * update the [[tokenCounts]] state under a K9 CDC [[SnapshotDiff]]
    * delta, tokenizing ONLY delta docs' text — departed docs leave by
    * anti-join on their own state rows, arrived docs enter through a
    * delta-pruned [[tokenCounts]] pass (with a partitioned layout
    * that semi join is file pruning, J2). Work is O(delta tokens +
    * state anti-join); the corpus is never re-exploded. The spec
    * proves it the K8/L4 way: poison every non-delta doc's text and
    * the maintained state must still power bit-equal K5/K6 answers. */
  def maintainTokenCounts(oldCounts: DataFrame, newDocs: DataFrame,
                          delta: DataFrame): DataFrame = {
    val gone = delta.where(col("change").isin("removed", "changed"))
      .select("doc_id")
    val arrived = delta.where(col("change").isin("added", "changed"))
      .select("doc_id")
    val deltaCounts = tokenCounts(
      newDocs.join(arrived, Seq("doc_id"), "left_semi"))
    oldCounts.join(gone, Seq("doc_id"), "left_anti")
      .unionByName(deltaCounts)
  }

  /** K5 from the maintained state: identical ranking arithmetic to
    * [[tfidfTopTerms]] (rational idf, same tie-break); `n_docs` is
    * derived from the state itself (every doc owns ≥1 token row —
    * `split` yields [""] even on empty text — so the distinct count
    * is exact). KSeriesSpec pins equality with the live form. */
  def tfidfFromCounts(counts: DataFrame, k: Int = TfIdfK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = counts.select(col("doc_id"), col("token"), col("c").as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = counts.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("token"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** K6 from the maintained state: collapse to the (source, token)
    * grain [[sourceDriftFrom]] computes internally, then the same
    * vocabulary-scale TV arithmetic. KSeriesSpec pins equality. */
  def sourceDriftFromCounts(counts: DataFrame): DataFrame =
    driftFromSourceTokenCounts(
      counts.groupBy("source", "token").agg(sum(col("c")).as("c")))

  // ---------------------------------------------------------------- K6
  /** K6: source-vs-corpus token-distribution drift — per source, the
    * total-variation distance `½·Σ|p_src(t) − p_rest(t)|` between its
    * token distribution and the REST of the corpus, plus the single
    * most over-represented token. The distribution-shift monitor of a
    * training pipeline: a source whose TV distance jumps between
    * snapshots changed its content mix (new boilerplate, a scraper
    * bug, an injected domain), and the argmax token says what. TV
    * rather than KL/JS keeps every arithmetic step IEEE-exact-or-
    * stable: int counts, one exact division each side, one |p−q| —
    * no logs (see K5) and no zero-count singularities (TV is finite
    * on disjoint supports, where KL diverges).
    *
    * Plan shape: one corpus-×-tokens explode into a (source, token)
    * count — map-side-collapsed like tf — then a vocabulary-sized
    * frame: per-source totals broadcast back, the |p−q| sum and
    * argmax are aggregations over |vocab|·|sources| rows. At 100 TB
    * the only corpus-scale stage is the first count; everything after
    * is vocabulary-scale.
    *
    * Degenerate case, defined explicitly: a source holding the WHOLE
    * corpus (single-source corpus, or one source owning every token)
    * has no "rest" to compare against — `n_all − n_src = 0` — and all
    * three drift outputs are NULL by definition in BOTH engines,
    * rather than whatever a division by zero happens to produce
    * (Spark NULL vs DuckDB ±inf would silently disagree). */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame =
    sourceDriftFrom(Tables.parallelized(spark, Tables.documents(spark, dir)))

  /** The drift monitor over an arbitrary (source, text) frame. */
  def sourceDriftFrom(docs: DataFrame): DataFrame =
    driftFromSourceTokenCounts(docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c")))

  /** The vocabulary-scale TV arithmetic over a (source, token, c)
    * count frame — shared verbatim by the live form and the
    * delta-maintained path ([[sourceDriftFromCounts]]), so the two
    * cannot drift. */
  private def driftFromSourceTokenCounts(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy("source").agg(sum("c").as("n_src"))
    val all = cnt.groupBy("token").agg(sum("c").as("c_all"))
    val grand = tot.agg(sum("n_src").as("n_all"))
    val p = col("c").cast("double") / col("n_src")
    // the per-token q divides by the same degenerate denominator the
    // outer CASE nulls out — under ANSI it must be guarded IN-ROW too,
    // or the job throws DIVIDE_BY_ZERO before the outer guard runs
    val q = when(col("n_all") === col("n_src"), lit(0.0))
      .otherwise((col("c_all") - col("c")).cast("double") / (col("n_all") - col("n_src")))
    // Tokens ABSENT from a source contribute p=0, |p−q| = q each; their
    // total is Σ_absent c_all / (n_all − n_src) with Σ_absent c_all =
    // n_all − Σ_present c_all — all-integer numerators, so the
    // correction is one exact division added to the present-token sum.
    cnt.join(tot, "source").join(all, "token").crossJoin(grand)
      .withColumn("p", p).withColumn("q", q)
      .groupBy("source", "n_src", "n_all")
      .agg(
        sum(abs(col("p") - col("q"))).as("present_sum"),
        sum(col("c_all")).as("present_c_all"),
        max(struct((col("p") - col("q")).as("gap"), col("token"))).as("m"))
      .select(col("source"),
        when(col("n_all") === col("n_src"), lit(null).cast("double"))
          .otherwise((col("present_sum")
            + (col("n_all") - col("present_c_all")).cast("double")
              / (col("n_all") - col("n_src"))) / 2).as("tv_distance"),
        when(col("n_all") === col("n_src"), lit(null).cast("string"))
          .otherwise(col("m.token")).as("top_token"),
        when(col("n_all") === col("n_src"), lit(null).cast("double"))
          .otherwise(col("m.gap")).as("top_token_gap"))
      .orderBy("source")
  }

  val sourceDriftSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |cnt AS (SELECT source, token, count(*) AS c FROM tok GROUP BY source, token),
      |tot AS (SELECT source, sum(c) AS n_src FROM cnt GROUP BY source),
      |al  AS (SELECT token, sum(c) AS c_all FROM cnt GROUP BY token),
      |g   AS (SELECT sum(n_src) AS n_all FROM tot)
      |SELECT source,
      |  CASE WHEN n_all = n_src THEN NULL
      |       ELSE (present_sum + CAST(n_all - present_c_all AS DOUBLE)
      |             / (n_all - n_src)) / 2 END AS tv_distance,
      |  CASE WHEN n_all = n_src THEN NULL ELSE m.token END AS top_token,
      |  CASE WHEN n_all = n_src THEN NULL ELSE m.gap END AS top_token_gap
      |FROM (
      |  SELECT cnt.source, tot.n_src, g.n_all,
      |    sum(abs(CAST(cnt.c AS DOUBLE) / tot.n_src
      |            - CAST(al.c_all - cnt.c AS DOUBLE) / (g.n_all - tot.n_src)))
      |      AS present_sum,
      |    sum(al.c_all) AS present_c_all,
      |    max(struct_pack(gap := CAST(cnt.c AS DOUBLE) / tot.n_src
      |            - CAST(al.c_all - cnt.c AS DOUBLE) / (g.n_all - tot.n_src),
      |          token := cnt.token)) AS m
      |  FROM cnt JOIN tot USING (source) JOIN al USING (token), g
      |  GROUP BY cnt.source, tot.n_src, g.n_all) t
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- U3
  /** Top-V vocabulary width for the pairwise source-distance matrix:
    * wide enough that the OTHER bucket is residual mass, small enough
    * that the pairwise arithmetic is a bounded artifact. */
  val SrcDivTopV = 256

  /** U3: pairwise source-distribution distance matrix — for every
    * source pair (a < b), the total-variation distance
    * `\u00bd\u00b7\u03a3|p_a(t) \u2212 p_b(t)|` between their token distributions,
    * restricted to the corpus's exact top-V vocabulary (count desc,
    * token asc \u2014 deterministic ties) plus a single OTHER bucket
    * carrying each source's residual mass, so every distribution sums
    * to exactly 1 over V+1 buckets. K6 monitors each source against
    * the REST; this is the matrix form a mixture designer reads when
    * deciding which sources are near-redundant (low TV \u2014 R3/S3
    * budget overlap) and which are genuinely complementary. TV over
    * KL/JS for the same reason as K6: integer counts, one exact
    * division per cell, no logs and no zero-mass singularities.
    *
    * Scale shape: the only corpus-scale stages are the top-V histogram
    * (one explode + vocab-grain agg), a SECOND explode pruned by the
    * broadcast top-V set BEFORE its (tiny) shuffle, and one NARROW
    * per-source token-total pass; the dense (V+1)\u00b7|sources| frame is
    * localCheckpoint-cut (bounded, two consumers) and the pairwise
    * self-join + TV fold are |pairs|\u00b7(V+1)-row arithmetic. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame =
    sourceDivergenceFrom(spark,
      Tables.parallelized(spark, Tables.documents(spark, dir)))

  def sourceDivergenceFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = docs.select(col("source"),
      explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
    // exact top-V: a bounded model artifact, collected like the BPE
    // vocab (count desc, token asc ties)
    val topv = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc).limit(SrcDivTopV)
      .select("token").collect().map(_.getString(0)).toSeq
    val tot = docs.groupBy("source")
      .agg(sum(size(split(coalesce(col("text"), lit("")), " "))
        .cast("long")).as("n_src"))
    val rc = toks.where(col("token").isin(topv: _*))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val dense = tot.crossJoin(broadcast(topv.toDF("token")))
      .join(rc, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        coalesce(col("c"), lit(0L)).as("c"), col("n_src"))
      .localCheckpoint() // bounded (V+1-ish \u00b7 |sources|), two consumers
    val oth = dense.groupBy("source")
      .agg((max("n_src") - sum("c")).as("c"), max("n_src").as("n_src"))
      .select(col("source"), lit("\u0001").as("token"), col("c"),
        col("n_src"))
    val all = dense.unionByName(oth)
      .select(col("source"), col("token"),
        (col("c").cast("double") / col("n_src")).as("p"))
    val a = all.select(col("source").as("source_a"), col("token"),
      col("p").as("pa"))
    val b = all.select(col("source").as("source_b"), col("token"),
      col("p").as("pb"))
    a.join(b, Seq("token")).where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(round(sum(abs(col("pa") - col("pb"))) / 2, 6).as("tv_distance"))
      .orderBy("source_a", "source_b")
  }

  /** U3's twin \u2014 the identical top-V + OTHER-bucket construction in
    * DuckDB (same deterministic tie order, same sentinel token). */
  def sourceDivergenceSql: String =
    s"""WITH tok AS (SELECT source,
      |         unnest(string_split(coalesce(text, ''), ' ')) AS token
      |       FROM documents),
      |gv AS (SELECT token FROM (
      |         SELECT token, count(*) AS c FROM tok GROUP BY token
      |         ORDER BY c DESC, token ASC LIMIT $SrcDivTopV)),
      |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
      |        FROM tok GROUP BY source),
      |rc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
      |       FROM tok WHERE token IN (SELECT token FROM gv)
      |       GROUP BY source, token),
      |dense AS (
      |  SELECT t.source, g.token, coalesce(rc.c, 0) AS c, t.n_src
      |  FROM tot t CROSS JOIN gv g
      |  LEFT JOIN rc ON rc.source = t.source AND rc.token = g.token),
      |alltok AS (
      |  SELECT source, token, c, n_src FROM dense
      |  UNION ALL
      |  SELECT source, chr(1) AS token, max(n_src) - sum(c) AS c,
      |         max(n_src) AS n_src
      |  FROM dense GROUP BY source)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  round(sum(abs(CAST(a.c AS DOUBLE) / a.n_src
      |                - CAST(b.c AS DOUBLE) / b.n_src)) / 2, 6)
      |    AS tv_distance
      |FROM alltok a JOIN alltok b
      |  ON a.token = b.token AND a.source < b.source
      |GROUP BY a.source, b.source
      |ORDER BY source_a, source_b""".stripMargin

  // ---------------------------------------------------------------- U5
  /** Top-R ranks fed to the per-source Zipf least-squares fit. */
  val ZipfTopR = 64

  /** U5: per-source vocabulary-scaling audit — token count, type
    * (distinct-token) count, type-token ratio (the Heaps'-law
    * operating point), and the Zipf slope: the least-squares slope of
    * ln(freq) against ln(rank) over the source's top-R terms (rank
    * ties broken token-asc, so the regression inputs are
    * deterministic). Natural prose sits near slope \u2212 1; a source that
    * reads \u2212 0.2 (flat: ID-like/templated tokens) or \u2212 3 (a few
    * tokens dominate: boilerplate) earns a look before it trains.
    * The E-series quality signals are per-doc; this is the
    * population-level complement (the K6 philosophy applied to the
    * frequency CURVE rather than the distribution mass).
    *
    * Scale shape: ONE corpus explode into the map-side-combined
    * (source, token) count; types/totals are a vocab-grain agg; the
    * top-R cut is a WindowGroupLimit (R rows per source cross the
    * wire); the regression is closed-form over |sources|\u00b7R bounded
    * rows \u2014 \u03a3x/\u03a3y/\u03a3xy/\u03a3x\u00b2 folds, no iteration. */
  def zipfAudit(spark: SparkSession, dir: String): DataFrame =
    zipfAuditFrom(spark,
      Tables.parallelized(spark, Tables.documents(spark, dir)))

  def zipfAuditFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs.select(col("source"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .localCheckpoint() // vocab-grain, two consumers (stats + top-R)
    val stats = cnt.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"))
    val w = Window.partitionBy("source")
      .orderBy(col("c").desc, col("token").asc)
    val top = cnt.withColumn("rank", row_number().over(w))
      .where(col("rank") <= ZipfTopR)
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    val fit = top.groupBy("source").agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    stats.join(fit, Seq("source"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0.0,
          lit(null).cast("double"))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6))
          .as("zipf_slope"))
      .orderBy("source")
  }

  /** U5's twin \u2014 identical rank ties, identical closed-form fit. */
  def zipfAuditSql: String =
    s"""WITH cnt AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source,
      |          unnest(string_split(coalesce(text, ''), ' ')) AS token
      |        FROM documents)
      |  GROUP BY source, token),
      |stats AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         CAST(count(*) AS BIGINT) AS n_types
      |  FROM cnt GROUP BY source),
      |top AS (
      |  SELECT source, c, rank FROM (
      |    SELECT source, c,
      |      row_number() OVER (PARTITION BY source
      |        ORDER BY c DESC, token ASC) AS rank
      |    FROM cnt) r
      |  WHERE rank <= $ZipfTopR),
      |fit AS (
      |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
      |    sum(ln(CAST(rank AS DOUBLE))) AS sx,
      |    sum(ln(CAST(c AS DOUBLE))) AS sy,
      |    sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy,
      |    sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))) AS sxx
      |  FROM top GROUP BY source)
      |SELECT stats.source, n_tokens, n_types,
      |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |       ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
      |  END AS zipf_slope
      |FROM stats JOIN fit USING (source)
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- U9
  /** Candidate vocabulary sizes the coverage ladder prices. */
  val VocabLadder: Seq[Int] = Seq(256, 1024, 4096, 16384)

  /** U9: vocabulary-coverage ladder \u2014 for each candidate vocab size V,
    * the fraction of the corpus's token MASS covered by the exact
    * top-V words (count desc, token asc ties). The sizing study run
    * before training P1's tokenizer: coverage vs V is the curve that
    * says where the vocab budget stops paying (its complement is the
    * char-fallback mass U1's fertility then measures). All-integer
    * numerators: covered and total are exact BIGINT sums, ONE double
    * division per ladder rung.
    *
    * Scale shape: one corpus explode into the map-side-combined token
    * histogram, cut to the max ladder rung by TakeOrdered (partial
    * top-k, driver holds \u2264 16384 rows); the rank + conditional-sum
    * fold runs over that bounded artifact; corpus token totals are a
    * separate NARROW pass (no second explode shuffle). */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageFrom(spark,
      Tables.parallelized(spark, Tables.documents(spark, dir)))

  def vocabCoverageFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs.select(
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(VocabLadder.max)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c").desc, col("token").asc)))
    val tot = docs.agg(sum(size(split(coalesce(col("text"), lit("")), " "))
      .cast("long")).as("total_tokens"))
    val folds = VocabLadder.map(v =>
      sum(when(col("rank") <= v, col("c")).otherwise(0L)).as(s"cov_$v"))
    top.agg(folds.head, folds.tail: _*)
      .crossJoin(tot)
      .select(col("total_tokens"),
        explode(array(VocabLadder.map { v =>
          struct(lit(v.toLong).as("v"), col(s"cov_$v").as("cov"))
        }: _*)).as("s"))
      .select(col("s.v").as("vocab_size"), col("s.cov").as("covered_tokens"),
        col("total_tokens"),
        round(col("s.cov").cast("double") /
          col("total_tokens").cast("double"), 6).as("coverage_frac"))
      .orderBy("vocab_size")
  }

  /** U9's twin \u2014 identical deterministic rank and integer folds. */
  def vocabCoverageSql: String = {
    val folds = VocabLadder.map(v =>
      s"CAST(sum(CASE WHEN rank <= $v THEN c ELSE 0 END) AS BIGINT) AS cov_$v")
      .mkString(",\n      |    ")
    val rungs = VocabLadder.map(v =>
      s"SELECT CAST($v AS BIGINT) AS vocab_size, cov_$v AS covered_tokens FROM folds")
      .mkString("\n      |  UNION ALL ")
    s"""WITH tok AS (SELECT unnest(string_split(coalesce(text, ''), ' '))
      |        AS token FROM documents),
      |hist AS (SELECT token, CAST(count(*) AS BIGINT) AS c
      |         FROM tok GROUP BY token),
      |ranked AS (
      |  SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS rank
      |  FROM hist),
      |folds AS (
      |  SELECT $folds
      |  FROM ranked WHERE rank <= ${VocabLadder.max}),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM tok),
      |rungs AS (
      |  $rungs)
      |SELECT vocab_size, covered_tokens, total_tokens,
      |  round(CAST(covered_tokens AS DOUBLE)
      |        / CAST(total_tokens AS DOUBLE), 6) AS coverage_frac
      |FROM rungs, tot
      |ORDER BY vocab_size""".stripMargin
  }
}
