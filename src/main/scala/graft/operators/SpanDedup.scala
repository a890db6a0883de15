package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.sources.Tables

/** S1: exact duplicated-substring SPAN removal — the suffix-array
  * dedup of published corpus work ("deduplicate any substring of ≥50
  * tokens that occurs more than once in the corpus", Lee et al. 2021,
  * Deduplicating Training Data Makes Language Models Better) restated
  * as a Spark plan. A suffix array is a single-machine data structure;
  * the distributable equivalent of "substring of ≥K tokens occurring
  * twice" is its K-gram witness: a maximal duplicated span is exactly
  * a maximal run of K-token windows whose grams each occur ≥2 times
  * corpus-wide (any duplicated span of length L ≥ K contains L−K+1
  * duplicated K-grams at consecutive positions, and conversely).
  * So: emit every (doc, position, K-gram), keep positions whose gram
  * repeats ANYWHERE (another doc or the same one — self-repetition is
  * duplication too, as in the suffix-array original), merge the
  * surviving [i, i+K) windows per doc into maximal islands
  * (gaps-and-islands: a window starting ≤K after the previous start
  * overlaps-or-abuts its coverage), and delete the covered tokens.
  * Every occurrence is removed, the paper's aggressive-but-published
  * variant (§4.1: they deduplicate all copies; keep-first is the noted
  * alternative and composes from this output by exempting the
  * occurrence with the smallest (doc_id, i)).
  *
  * Complementary to the other dedup modes: C1 drops exact WHOLE-doc
  * copies, C2-C5 drop near-dup DOCS, L2 drops document-frequent TILES
  * (boilerplate by df), I3 only MEASURES cross-doc gram sharing. This
  * is the one that edits INSIDE surviving documents — the quotes,
  * licenses, and templated paragraphs that ride along inside otherwise
  * unique pages.
  *
  * Scale shape: the only corpus-×-tokens exchanges are on the gram
  * key — a groupBy whose map-side partial agg collapses each task to
  * its distinct grams, then a co-partitioned join back (both hash on
  * `gh`; a pathologically hot gram is bounded map-side on the count
  * path and AQE-skew-split on the join path, the I3 argument). Grams
  * ship as 8 B xxhash64 keys, never strings (I3's measured 2.6×
  * shuffle cut; collision math at Dedup/CorpusStats — ~10⁻⁷ of groups
  * merged at 10¹² grams, noise for a span signal and strictly
  * CONSERVATIVE here: a collision can only over-mark a span as
  * duplicated, never resurrect one). Everything after the anchor join
  * is doc-grain: the island windows partition by doc_id (bounded by
  * document length), coverage and token filtering are per-row lambda
  * work inside codegen.
  *
  * Engine determinism: all-integer until the final `dup_frac`
  * (rounded to 6 dp); tokens are the house single-space split keeping
  * empties; spans at the document tail truncate to n_tokens in both
  * engines.
  */
object SpanDedup {

  /** Span witness width in tokens. Published exact-substring dedup
    * uses 50-token spans on web text; on this synthetic corpus
    * (docs of ~30-100 tokens) 8 is the proportionate choice — the
    * knob is a literal in both plan and oracle. */
  val SpanK = 8

  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedupFrom(spark,
      Tables.parallelized(spark, Tables.documents(spark, dir)))

  /** Span-dedup over an arbitrary (doc_id, text) frame: doc_id,
    * n_tokens, n_spans (maximal duplicated spans), dup_tokens /
    * kept_tokens / dup_frac, and clean_text with every covered token
    * removed (order kept, single-space rejoin).
    *
    * NULL text is DELIBERATELY conflated with '' across the whole
    * span family (coalesce here and in S5/T1/T2, mirrored in every
    * SQL twin): span dedup is about shared token content, and a
    * NULL doc and an empty doc share the same (empty) content — two
    * such docs reporting each other as exact span-dups is the
    * intended dedup semantics, not an identity statement. This is
    * the opposite convention from SnapshotDiff's CDC digests, where
    * NULL vs '' is a real data difference and a \u0001 sentinel
    * keeps them distinct — content semantics there are identity,
    * here they are text mass. */
  def spanDedupFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      split(coalesce(col("text"), lit("")), " ", -1).as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    // positional K-gram stream; shinglesFast end-truncates to
    // max(T-K+1, 1) windows so sub-K docs contribute their whole text
    // as one (truncated) witness — an exact-dup short doc is a span
    val grams = docs.select(col("doc_id"),
      posexplode(Vectors.shinglesFast(spark, coalesce(col("text"), lit("")), SpanK,
        distinct = false)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("i"),
        xxhash64(col("g")).as("gh"))
    val freq = grams.groupBy("gh").agg(count(lit(1)).as("occ"))
    // only DUP grams anchor spans, and dup occurrences are a small
    // slice of the positional stream — the J6 bloom prune sheds the
    // rest inside the probe's scan stage, so the anchor join's sorts
    // shrink to the dup slice (the I3 device; the organic 1000× probe
    // measured the unpruned join 2× over linear). freq is unique per
    // gh, so the inner join ≡ left-semi the prune wraps.
    val dupG = freq.where(col("occ") >= 2)
      .select(col("gh").as("dup_gh")).localCheckpoint()
    val anchors = BloomJoin.bloomPrunedSemi(spark, grams, "gh",
        dupG, "dup_gh", expectedItems = math.max(dupG.count(), 1024L))
      .select("doc_id", "i")
    sealSpans(base, anchors)
  }

  /** The doc-grain back half shared by the full and incremental
    * forms: merge anchor windows into maximal islands, price
    * coverage, delete covered tokens. `base` = (doc_id, tk,
    * n_tokens); `anchors` = (doc_id, i). */
  private def sealSpans(base: DataFrame, anchors: DataFrame,
                        k: Int = SpanK): DataFrame = {
    // gaps-and-islands: window [i, i+K) merges with the previous
    // anchor's window iff i - prev <= K (overlap or abutment)
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val spans = anchors
      .withColumn("prev", lag("i", 1).over(wDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("i") - col("prev") > k, 1L)
          .otherwise(0L))
      .withColumn("isl", sum("brk").over(wDoc))
      .groupBy("doc_id", "isl")
      .agg(min("i").as("p0"), max("i").as("p1"))
    val spansD = spans
      .join(base.select("doc_id", "n_tokens"), Seq("doc_id"))
      .select(col("doc_id"), col("p0"),
        least(col("p1") + lit(k - 1), col("n_tokens")).as("pend"))
    val agg = spansD.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("pend") - col("p0") + 1).as("dup_tokens"),
        collect_list(struct(col("p0"), col("pend"))).as("spans"))
    base.join(agg, Seq("doc_id"), "left")
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("clean_text",
        when(col("spans").isNull, concat_ws(" ", col("tk")))
          .otherwise(expr(
            """concat_ws(' ', filter(tk, (t, x) ->
              |  not exists(spans, s -> x + 1 >= s.p0 and x + 1 <= s.pend)))"""
              .stripMargin)))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_tokens"),
        (col("n_tokens") - col("dup_tokens")).as("kept_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_frac"),
        col("clean_text"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- S5
  /** Report length for [[spanReport]]. */
  val ReportTopK = 20

  /** S5: the duplicated-PASSAGE report — I5 (top grams by document
    * frequency) upgraded to maximal extents: which actual passages
    * (license blocks, templated paragraphs, quoted boilerplate) carry
    * the most duplicated token mass, ranked by `len × occurrences`.
    * This is the forensic view a corpus owner reads before deciding
    * what S1 should cut — the S1 islands grouped by their text.
    * Near-identical spans whose maximal extents differ stay separate
    * rows (the report shows extents as observed, it does not cluster).
    *
    * Scale shape: S1's anchor pipeline (hashed-gram exchange, measured
    * linear) + doc-grain islands; the report aggregation ships one row
    * per ISLAND (the ~9%-of-positions anchor tail, grouped map-side by
    * passage) and top-ks via TakeOrderedAndProject — k rows per
    * partition cross the wire, the I5 discipline. */
  def spanReport(spark: SparkSession, dir: String): DataFrame =
    spanReportFrom(spark,
      Tables.parallelized(spark, Tables.documents(spark, dir)))

  def spanReportFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      split(coalesce(col("text"), lit("")), " ", -1).as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val grams = docs.select(col("doc_id"),
      posexplode(Vectors.shinglesFast(spark, coalesce(col("text"), lit("")), SpanK,
        distinct = false)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("i"),
        xxhash64(col("g")).as("gh"))
    val freq = grams.groupBy("gh").agg(count(lit(1)).as("occ"))
    val anchors = grams
      .join(freq.where(col("occ") >= 2), Seq("gh"))
      .select("doc_id", "i")
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val spans = anchors
      .withColumn("prev", lag("i", 1).over(wDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("i") - col("prev") > SpanK, 1L)
          .otherwise(0L))
      .withColumn("isl", sum("brk").over(wDoc))
      .groupBy("doc_id", "isl")
      .agg(min("i").as("p0"), max("i").as("p1"))
    spans.join(base, Seq("doc_id"))
      .select(col("p0"),
        least(col("p1") + lit(SpanK - 1), col("n_tokens")).as("pend"),
        col("tk"))
      .select(
        concat_ws(" ", slice(col("tk"), col("p0"),
          col("pend") - col("p0") + lit(1))).as("passage"),
        (col("pend") - col("p0") + 1).as("len"))
      .groupBy("passage")
      .agg(count(lit(1)).as("n_occurrences"), max("len").as("len_tokens"))
      .select(col("passage"), col("len_tokens"), col("n_occurrences"),
        (col("len_tokens") * col("n_occurrences")).as("dup_mass"))
      .orderBy(col("dup_mass").desc, col("passage"))
      .limit(ReportTopK)
  }

  def spanReportSql: String = {
    val K = SpanK
    s"""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk FROM documents),
      |n AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM t),
      |pos AS (
      |  SELECT doc_id, i, array_to_string(tk[i:i+${K - 1}], ' ') AS g
      |  FROM (SELECT doc_id, tk,
      |          unnest(range(1, greatest(len(tk) - ${K - 2}, 2))) AS i
      |        FROM t)),
      |freq AS (SELECT g, count(*) AS occ FROM pos GROUP BY g),
      |a AS (SELECT doc_id, i FROM pos JOIN freq USING (g) WHERE occ >= 2),
      |lagd AS (SELECT doc_id, i,
      |    lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM a),
      |isl AS (SELECT doc_id, i,
      |    sum(CASE WHEN prev IS NULL OR i - prev > $K THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY i) AS isl
      |  FROM lagd),
      |sp AS (SELECT doc_id, isl, min(i) AS p0, max(i) AS p1
      |       FROM isl GROUP BY doc_id, isl),
      |pass AS (
      |  SELECT array_to_string(tk[CAST(p0 AS INTEGER):
      |           CAST(least(p1 + ${K - 1}, n.n_tokens) AS INTEGER)], ' ')
      |           AS passage,
      |         least(p1 + ${K - 1}, n.n_tokens) - p0 + 1 AS len
      |  FROM sp JOIN n USING (doc_id)),
      |rep AS (SELECT passage, count(*) AS n_occurrences,
      |          CAST(max(len) AS BIGINT) AS len_tokens
      |        FROM pass GROUP BY passage)
      |SELECT passage, len_tokens, n_occurrences,
      |  CAST(len_tokens * n_occurrences AS BIGINT) AS dup_mass
      |FROM rep
      |ORDER BY dup_mass DESC, passage
      |LIMIT $ReportTopK""".stripMargin
  }

  // ---------------------------------------------------------- T1
  /** House incremental-batch split (the H4 convention): ~20% of docs
    * by salted hash are "the new batch", the rest "the existing
    * corpus". */
  private val BatchSalt = "batch"
  private val BatchPct = 20

  /** T1: INCREMENTAL span dedup — the production crawl-ingest mode.
    * The existing corpus's gram-occurrence index (gh → count; the
    * persisted artifact at scale, the H4 band-index precedent) prices
    * each NEW document's spans without touching old text: a new
    * position anchors iff its gram occurs in the old index at all OR
    * ≥2× within the batch itself. That condition is EXACTLY the full
    * recompute's `occ_total ≥ 2` restricted to new rows (the position
    * itself contributes 1 batch occurrence), so incremental output ==
    * full span dedup filtered to the batch — pinned by SSeriesSpec,
    * not asserted. Batch cost: one gram pass over the BATCH + one
    * bucketed join against the index; the old corpus is never
    * re-scanned (here the index derives from the old split in-query
    * for oracle self-containment). */
  private[graft] def isNewBatch(c: org.apache.spark.sql.Column) =
    Sampling.hashBucket(c, BatchSalt) < Sampling.pctThreshold(BatchPct)

  /** The corpus gram-occurrence index (gh → occ) — the artifact a
    * deployment persists and maintains at ingest cadence. */
  def spanGramIndex(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(posexplode(Vectors.shinglesFast(spark, coalesce(col("text"), lit("")), SpanK,
        distinct = false)).as(Seq("p0", "g")))
      .groupBy(xxhash64(col("g")).as("gh"))
      .agg(count(lit(1)).as("occ_old"))

  /** M4 removal maintenance for the occurrence-keyed [[spanGramIndex]]:
    * the index has no doc attribution (that boundedness is its point),
    * so departure is COUNT SUBTRACTION — one gram pass over the
    * REMOVED docs' text (a removal request is served from the corpus
    * before its rows drop; survivors are never read), exhausted rows
    * (occ 0) leave the index. O(|removed| grams + one index join). */
  def maintainSpanIndexRemoval(spark: SparkSession, oldIndex: DataFrame,
                               removedDocs: DataFrame): DataFrame = {
    val removedCounts = removedDocs
      .select(posexplode(Vectors.shinglesFast(spark,
        coalesce(col("text"), lit("")), SpanK, distinct = false))
        .as(Seq("p0", "g")))
      .groupBy(xxhash64(col("g")).as("gh"))
      .agg(count(lit(1)).as("occ_rm"))
    oldIndex.join(removedCounts, Seq("gh"), "left")
      .select(col("gh"),
        (col("occ_old") - coalesce(col("occ_rm"), lit(0L))).as("occ_old"))
      .where(col("occ_old") > 0)
  }

  def spanDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(spark, Tables.documents(spark, dir))
    spanDedupIncrementalFrom(spark,
      docs.where(isNewBatch(col("doc_id"))),
      spanGramIndex(spark, docs.where(!isNewBatch(col("doc_id")))))
  }

  /** Batch-side pass over an arbitrary new-docs frame and a (gh,
    * occ_old) index — the cost a deployment pays per crawl batch. */
  def spanDedupIncrementalFrom(spark: SparkSession, newDocs: DataFrame,
                               oldIndex: DataFrame): DataFrame = {
    val base = newDocs.select(col("doc_id"),
      split(coalesce(col("text"), lit("")), " ", -1).as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val batchGrams = newDocs.select(col("doc_id"),
      posexplode(Vectors.shinglesFast(spark, coalesce(col("text"), lit("")), SpanK,
        distinct = false)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("i"),
        xxhash64(col("g")).as("gh"))
    val dupGh = batchGrams.groupBy("gh").agg(count(lit(1)).as("occ_b"))
      .join(oldIndex, Seq("gh"), "left")
      .where(coalesce(col("occ_old"), lit(0L)) >= 1 || col("occ_b") >= 2)
      .select("gh")
    val anchors = batchGrams.join(dupGh, Seq("gh")).select("doc_id", "i")
    sealSpans(base, anchors)
  }

  def spanDedupIncrementalSql: String = {
    val K = SpanK
    val isNew = (c: String) =>
      s"${Sampling.hashBucketSql(c, BatchSalt)} < ${Sampling.pctThreshold(BatchPct)}"
    s"""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk
      |           FROM documents WHERE ${isNew("doc_id")}),
      |n AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM t),
      |oldg AS (
      |  SELECT array_to_string(tk[i:i+${K - 1}], ' ') AS g,
      |         count(*) AS occ_old
      |  FROM (SELECT tk,
      |          unnest(range(1, greatest(len(tk) - ${K - 2}, 2))) AS i
      |        FROM (SELECT string_split(coalesce(text, ''), ' ') AS tk FROM documents
      |              WHERE NOT (${isNew("doc_id")})))
      |  GROUP BY 1),
      |pos AS (
      |  SELECT doc_id, i, array_to_string(tk[i:i+${K - 1}], ' ') AS g
      |  FROM (SELECT doc_id, tk,
      |          unnest(range(1, greatest(len(tk) - ${K - 2}, 2))) AS i
      |        FROM t)),
      |freqb AS (SELECT g, count(*) AS occ_b FROM pos GROUP BY g),
      |dup AS (
      |  SELECT freqb.g FROM freqb LEFT JOIN oldg USING (g)
      |  WHERE coalesce(occ_old, 0) >= 1 OR occ_b >= 2),
      |a AS (SELECT doc_id, i FROM pos JOIN dup USING (g)),
      |lagd AS (SELECT doc_id, i,
      |    lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM a),
      |isl AS (SELECT doc_id, i,
      |    sum(CASE WHEN prev IS NULL OR i - prev > $K THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY i) AS isl
      |  FROM lagd),
      |sp AS (SELECT doc_id, isl, min(i) AS p0, max(i) AS p1
      |       FROM isl GROUP BY doc_id, isl),
      |spd AS (SELECT sp.doc_id, p0,
      |          least(p1 + ${K - 1}, n.n_tokens) AS pend
      |        FROM sp JOIN n USING (doc_id)),
      |agg AS (SELECT doc_id, count(*) AS n_spans,
      |          CAST(sum(pend - p0 + 1) AS BIGINT) AS dup_tokens
      |        FROM spd GROUP BY doc_id),
      |tokpos AS (SELECT doc_id, j, tk[CAST(j AS INTEGER)] AS tok
      |           FROM (SELECT doc_id, tk,
      |                   unnest(range(1, len(tk) + 1)) AS j FROM t)),
      |cov AS (SELECT doc_id, unnest(range(p0, pend + 1)) AS j FROM spd),
      |clean AS (SELECT tp.doc_id,
      |            string_agg(tok, ' ' ORDER BY tp.j) AS clean_text
      |          FROM tokpos tp LEFT JOIN cov c
      |            ON tp.doc_id = c.doc_id AND tp.j = c.j
      |          WHERE c.j IS NULL
      |          GROUP BY tp.doc_id)
      |SELECT n.doc_id, n.n_tokens,
      |  coalesce(agg.n_spans, 0) AS n_spans,
      |  coalesce(agg.dup_tokens, 0) AS dup_tokens,
      |  n.n_tokens - coalesce(agg.dup_tokens, 0) AS kept_tokens,
      |  round(CAST(coalesce(agg.dup_tokens, 0) AS DOUBLE) / n.n_tokens, 6)
      |    AS dup_frac,
      |  coalesce(clean.clean_text, '') AS clean_text
      |FROM n
      |LEFT JOIN agg USING (doc_id)
      |LEFT JOIN clean USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- T2
  /** House benchmark split (the H1 convention): ~5% of docs by salted
    * hash stand in for the eval suite. */
  private val BenchSalt = "bench"
  private val BenchPct = 5
  /** T2's witness width: 5 tokens — the I3 proportionate-gram choice.
    * Decontamination wants PARTIAL overlap (a quoted eval question
    * inside a page), and this corpus's cross-doc sharing lives at the
    * 5-gram level; the 13-gram GPT-3 width maps to ~K=8 here and
    * catches only exact twins. */
  val DecontamK = 5

  /** T2: SPAN-level decontamination — H1 flags whole documents whose
    * shingle containment against an eval item clears a bar; this is
    * the published SURGICAL variant (GPT-3's own protocol, Brown et
    * al. 2020 Appendix C: remove colliding 13-grams and a window
    * around them, leaving the rest of the page) — contaminated SPANS
    * are cut out of otherwise-keepable documents instead of dropping
    * the page. Anchors are positions whose K-gram occurs ANYWHERE in
    * the benchmark set; the S1 island/coverage machinery seals and
    * deletes them.
    *
    * Scale shape: the benchmark gram set is DISTINCT grams of a
    * constant-size eval suite (the H1 broadcast argument — eval
    * suites are 10³-10⁵ items regardless of corpus size), so the
    * corpus side is one narrow positional-gram pass probed against a
    * broadcast — NO corpus-scale shuffle at all on the gram side;
    * only anchor rows (the contamination hits) reach the doc-grain
    * windows. */
  def spanDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(spark, Tables.documents(spark, dir))
    val isBench = Sampling.hashBucket(col("doc_id"), BenchSalt) <
      Sampling.pctThreshold(BenchPct)
    spanDecontaminateFrom(spark, docs.where(!isBench),
      docs.where(isBench))
  }

  /** Scrub over arbitrary corpus and benchmark frames — the
    * production shape (real eval suites are their own tables). `k` is
    * the witness width (default [[DecontamK]]; [[decontaminateWidths]]
    * sweeps it). */
  def spanDecontaminateFrom(spark: SparkSession, corpus: DataFrame,
                            bench: DataFrame,
                            k: Int = DecontamK): DataFrame = {
    val benchGrams = bench
      .select(explode(Vectors.shinglesFast(spark, coalesce(col("text"), lit("")), k,
        distinct = true)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    val base = corpus.select(col("doc_id"),
      split(coalesce(col("text"), lit("")), " ", -1).as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val anchors = corpus.select(col("doc_id"),
      posexplode(Vectors.shinglesFast(spark, coalesce(col("text"), lit("")), k,
        distinct = false)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("i"),
        xxhash64(col("g")).as("gh"))
      .join(broadcast(benchGrams), Seq("gh"))
      .select("doc_id", "i")
    sealSpans(base, anchors, k)
      .withColumnRenamed("dup_tokens", "contam_tokens")
      .withColumnRenamed("dup_frac", "contam_frac")
  }

  // ---------------------------------------------------------- T4
  /** Witness widths for the [[decontaminateWidths]] sensitivity
    * report: 5 (this corpus's partial-overlap grain, = [[DecontamK]]),
    * 8 (the S1 exact-twin grain), 13 (the published GPT-3 width). */
  val DecontamWidths: Seq[Int] = Seq(5, 8, 13)

  /** T4: decontamination width-sensitivity report — the protocol knob
    * every published decontamination differs on (GPT-3 uses 13-grams,
    * PaLM 8, Llama-era work down to 5) swept over [[DecontamWidths]]
    * against the SAME corpus/benchmark split as T2, emitting one row
    * per width: documents hit, contaminated token mass, and the mass
    * fraction. The curve is the evidence for choosing T2's production
    * width — a width where the mass explodes is matching generic
    * phrases, a width where it vanishes only catches verbatim twins.
    *
    * Three corpus gram passes (one per width) by design: widths don't
    * share gram streams, and a multi-width fused pass would triple
    * the exchanged anchor volume for the two widths a deployment
    * would NOT pick; the per-width pass inherits T2's scale shape
    * (broadcast bench grams, anchors-only to the doc windows). */
  def decontaminateWidths(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelized(spark, Tables.documents(spark, dir))
    val isBench = Sampling.hashBucket(col("doc_id"), BenchSalt) <
      Sampling.pctThreshold(BenchPct)
    val corpus = docs.where(!isBench)
    val bench = docs.where(isBench)
    DecontamWidths.map { k =>
      spanDecontaminateFrom(spark, corpus, bench, k)
        .agg(
          sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("contaminated_docs"),
          sum(col("contam_tokens")).as("contam_tokens"),
          sum(col("n_tokens")).as("total_tokens"))
        .select(lit(k).as("width"), col("contaminated_docs"),
          col("contam_tokens"), col("total_tokens"),
          round(col("contam_tokens").cast("double") / col("total_tokens"), 6)
            .as("contam_token_frac"))
    }.reduce(_ unionAll _).orderBy("width")
  }

  def decontaminateWidthsSql: String =
    DecontamWidths.map { k =>
      val inner = spanDecontaminateSqlFor(k)
        .replaceAll("ORDER BY doc_id\\s*$", "")
      s"""SELECT $k AS width,
        |  CAST(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS contaminated_docs,
        |  CAST(sum(contam_tokens) AS BIGINT) AS contam_tokens,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(contam_tokens) AS DOUBLE) / sum(n_tokens), 6)
        |    AS contam_token_frac
        |FROM ($inner) w$k""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY width")

  def spanDecontaminateSql: String = spanDecontaminateSqlFor(DecontamK)

  def spanDecontaminateSqlFor(k: Int): String = {
    val K = k
    val isBench = s"${Sampling.hashBucketSql("doc_id", BenchSalt)} < " +
      s"${Sampling.pctThreshold(BenchPct)}"
    s"""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk
      |           FROM documents WHERE NOT ($isBench)),
      |n AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM t),
      |bg AS (
      |  SELECT DISTINCT array_to_string(tk[i:i+${K - 1}], ' ') AS g
      |  FROM (SELECT tk,
      |          unnest(range(1, greatest(len(tk) - ${K - 2}, 2))) AS i
      |        FROM (SELECT string_split(coalesce(text, ''), ' ') AS tk FROM documents
      |              WHERE $isBench))),
      |pos AS (
      |  SELECT doc_id, i, array_to_string(tk[i:i+${K - 1}], ' ') AS g
      |  FROM (SELECT doc_id, tk,
      |          unnest(range(1, greatest(len(tk) - ${K - 2}, 2))) AS i
      |        FROM t)),
      |a AS (SELECT doc_id, i FROM pos JOIN bg USING (g)),
      |lagd AS (SELECT doc_id, i,
      |    lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM a),
      |isl AS (SELECT doc_id, i,
      |    sum(CASE WHEN prev IS NULL OR i - prev > $K THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY i) AS isl
      |  FROM lagd),
      |sp AS (SELECT doc_id, isl, min(i) AS p0, max(i) AS p1
      |       FROM isl GROUP BY doc_id, isl),
      |spd AS (SELECT sp.doc_id, p0,
      |          least(p1 + ${K - 1}, n.n_tokens) AS pend
      |        FROM sp JOIN n USING (doc_id)),
      |agg AS (SELECT doc_id, count(*) AS n_spans,
      |          CAST(sum(pend - p0 + 1) AS BIGINT) AS contam_tokens
      |        FROM spd GROUP BY doc_id),
      |tokpos AS (SELECT doc_id, j, tk[CAST(j AS INTEGER)] AS tok
      |           FROM (SELECT doc_id, tk,
      |                   unnest(range(1, len(tk) + 1)) AS j FROM t)),
      |cov AS (SELECT doc_id, unnest(range(p0, pend + 1)) AS j FROM spd),
      |clean AS (SELECT tp.doc_id,
      |            string_agg(tok, ' ' ORDER BY tp.j) AS clean_text
      |          FROM tokpos tp LEFT JOIN cov c
      |            ON tp.doc_id = c.doc_id AND tp.j = c.j
      |          WHERE c.j IS NULL
      |          GROUP BY tp.doc_id)
      |SELECT n.doc_id, n.n_tokens,
      |  coalesce(agg.n_spans, 0) AS n_spans,
      |  coalesce(agg.contam_tokens, 0) AS contam_tokens,
      |  n.n_tokens - coalesce(agg.contam_tokens, 0) AS kept_tokens,
      |  round(CAST(coalesce(agg.contam_tokens, 0) AS DOUBLE) / n.n_tokens, 6)
      |    AS contam_frac,
      |  coalesce(clean.clean_text, '') AS clean_text
      |FROM n
      |LEFT JOIN agg USING (doc_id)
      |LEFT JOIN clean USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin — same single-space split keeping empties, the house
    * end-truncated gram window (max(T-K+1, 1) positions; the slice
    * clamps at the list end), raw gram strings where the plan ships
    * xxhash64 keys. Integer aggregates CAST back to BIGINT (DuckDB
    * sums promote to HUGEINT, which the driver hashes as float). */
  def spanDedupSql: String = {
    val K = SpanK
    s"""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk FROM documents),
      |n AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM t),
      |pos AS (
      |  SELECT doc_id, i, array_to_string(tk[i:i+${K - 1}], ' ') AS g
      |  FROM (SELECT doc_id, tk,
      |          unnest(range(1, greatest(len(tk) - ${K - 2}, 2))) AS i
      |        FROM t)),
      |freq AS (SELECT g, count(*) AS occ FROM pos GROUP BY g),
      |a AS (SELECT doc_id, i FROM pos JOIN freq USING (g) WHERE occ >= 2),
      |lagd AS (SELECT doc_id, i,
      |    lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM a),
      |isl AS (SELECT doc_id, i,
      |    sum(CASE WHEN prev IS NULL OR i - prev > $K THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY i) AS isl
      |  FROM lagd),
      |sp AS (SELECT doc_id, isl, min(i) AS p0, max(i) AS p1
      |       FROM isl GROUP BY doc_id, isl),
      |spd AS (SELECT sp.doc_id, p0,
      |          least(p1 + ${K - 1}, n.n_tokens) AS pend
      |        FROM sp JOIN n USING (doc_id)),
      |agg AS (SELECT doc_id, count(*) AS n_spans,
      |          CAST(sum(pend - p0 + 1) AS BIGINT) AS dup_tokens
      |        FROM spd GROUP BY doc_id),
      |tokpos AS (SELECT doc_id, j, tk[CAST(j AS INTEGER)] AS tok
      |           FROM (SELECT doc_id, tk,
      |                   unnest(range(1, len(tk) + 1)) AS j FROM t)),
      |cov AS (SELECT doc_id, unnest(range(p0, pend + 1)) AS j FROM spd),
      |clean AS (SELECT tp.doc_id,
      |            string_agg(tok, ' ' ORDER BY tp.j) AS clean_text
      |          FROM tokpos tp LEFT JOIN cov c
      |            ON tp.doc_id = c.doc_id AND tp.j = c.j
      |          WHERE c.j IS NULL
      |          GROUP BY tp.doc_id)
      |SELECT n.doc_id, n.n_tokens,
      |  coalesce(agg.n_spans, 0) AS n_spans,
      |  coalesce(agg.dup_tokens, 0) AS dup_tokens,
      |  n.n_tokens - coalesce(agg.dup_tokens, 0) AS kept_tokens,
      |  round(CAST(coalesce(agg.dup_tokens, 0) AS DOUBLE) / n.n_tokens, 6)
      |    AS dup_frac,
      |  coalesce(clean.clean_text, '') AS clean_text
      |FROM n
      |LEFT JOIN agg USING (doc_id)
      |LEFT JOIN clean USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }
}
