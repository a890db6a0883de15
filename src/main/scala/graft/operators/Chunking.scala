package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** K1: document chunking — the window-with-overlap split every
  * retrieval/training pipeline runs between curation and encoding:
  * each document becomes ceil-many fixed-width character windows with
  * a fixed overlap, so downstream context assembly can stitch
  * neighboring chunks without losing boundary sentences. Chunk
  * identity is (doc_id, chunk_ix) with exact [char_start, char_end)
  * offsets back into the source text — the provenance a dedup or
  * attribution pass needs to map a chunk hit back to its document.
  *
  * Windowing rule (chars; a token window is the same arithmetic over
  * a token-offset array): stride S = window - overlap; chunk starts
  * at i·S for i in 0 .. floor(max(len - overlap - 1, 0) / S). The
  * upper bound means a final window is emitted only if it contributes
  * at least one character beyond the previous window's overlap — no
  * trailing chunk that is a strict sub-range of its predecessor, and
  * a doc shorter than the window still emits exactly chunk 0.
  *
  * Scale shape: one narrow projection + a per-row `sequence`/`explode`
  * (codegen'd generate, no shuffle, no state) — output volume is
  * len/S rows per doc, decided row-locally; at 100 TB chunking fuses
  * into the scan stage of whatever consumes the chunks. The `explode`
  * multiplies rows ~len/S ≈ 3-4× at these dials, which AQE re-splits
  * downstream if a consumer shuffles.
  */
object Chunking {

  /** Window width / overlap in characters. 200/40 are fixture-scaled
    * dials (docs run ~500 chars); production values are the same
    * arithmetic at 2048/256. */
  val Window = 200
  val Overlap = 40
  val Stride: Int = Window - Overlap

  def chunks(spark: SparkSession, dir: String,
             window: Int = Window, overlap: Int = Overlap): DataFrame = {
    val stride = window - overlap
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).as("len"))
      .withColumn("chunk_ix", explode(sequence(lit(0),
        floor(greatest(col("len") - overlap - 1, lit(0)) / stride).cast("int"))))
      .select(
        col("doc_id"), col("source"), col("chunk_ix").cast("long").as("chunk_ix"),
        (col("chunk_ix") * stride).cast("long").as("char_start"),
        least(col("chunk_ix") * stride + window, col("len"))
          .cast("long").as("char_end"),
        substring(col("text"), col("chunk_ix") * stride + 1, lit(window))
          .as("chunk_text"))
  }

  /** Oracle form: total order for the hash compare. The operator
    * itself stays unordered — a sort would be a pointless exchange at
    * 100 TB. */
  def qChunks(spark: SparkSession, dir: String): DataFrame =
    chunks(spark, dir).orderBy("doc_id", "chunk_ix")

  def chunksSql(window: Int = Window, overlap: Int = Overlap): String = {
    val stride = window - overlap
    s"""SELECT doc_id, source, ix AS chunk_ix,
      |  ix * $stride AS char_start,
      |  least(ix * $stride + $window, length(text)) AS char_end,
      |  substring(text, CAST(ix * $stride + 1 AS INT), $window) AS chunk_text
      |FROM (SELECT doc_id, source, text,
      |        unnest(range(0, CAST(floor(greatest(length(text) - $overlap - 1, 0) / $stride) AS BIGINT) + 1)) AS ix
      |      FROM documents) t
      |ORDER BY doc_id, chunk_ix""".stripMargin
  }

  // ---------------------------------------------------------------- X1
  /** Rolling-hash window (tokens) for the boundary test. */
  val CdcWindow = 4
  /** Boundary divisor: a window position ends a chunk when its gram
    * hash ≡ 0 (mod [[CdcDivisor]]) — expected chunk length ≈ divisor
    * tokens (the FastCDC/LBFS content-defined rule at token grain). */
  val CdcDivisor = 8
  private val cdcSalt = "cdc"

  /** X1: content-defined chunk dedup (the LBFS/FastCDC device —
    * Muthitacharoen et al. 2001, Xia et al. 2016 — at token grain):
    * chunk boundaries are a pure function of local CONTENT (the
    * rolling gram hash), so an insertion near a doc's head shifts
    * every downstream byte yet leaves all later chunk boundaries —
    * and therefore their signatures — unchanged. That shift-
    * robustness is exactly what K1's fixed windows lack and what S1's
    * exact-substring machinery pays a gram-index join for; CDC gets
    * it with ONE narrow per-doc pass and a hash-grain groupBy. A
    * chunk is duplicated iff its signature occurs ≥ 2 times
    * corpus-wide (cross-doc copies AND self-repetition both count —
    * both are priced token mass).
    *
    * Plan shape: boundaries and chunk texts are built IN-ARRAY per
    * doc (filter/transform over the token array — no per-token
    * explode, no window function), then one explode at CHUNK grain
    * (~n/divisor rows), one md5-key groupBy for occurrence counts,
    * and the per-doc rollup. Every hash is md5-derived so both
    * engines agree bit-for-bit. */
  def cdcDedup(spark: SparkSession, dir: String): DataFrame =
    cdcDedupFrom(Tables.documents(spark, dir))

  /** (doc_id, n_tokens, sig, ctok) — one row per content-defined
    * chunk of each doc: the shared grain under X1's corpus-wide dup
    * report and X2's incremental form. Narrow end to end (one
    * in-array boundary pass, one chunk-grain explode), so it applies
    * to batch and streaming inputs alike. */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    val W = CdcWindow
    // Catalyst DUPLICATES a sub-expression tree at every reference
    // site inside a lambda (no CSE in interpreted higher-order
    // functions), so naively referencing the token array / boundary
    // list from the chunk builder re-evaluates split+md5 per chunk —
    // measured quadratic per doc. Binding each array as a
    // single-element array() lambda argument evaluates it ONCE per
    // row; all inner references are to the bound variable.
    def bpsOf(tk: Column): Column =
      filter(sequence(lit(1), size(tk)), p => (p === size(tk)) ||
        (p >= W &&
          Sampling.hashBucket(
            array_join(slice(tk, p - W + 1, lit(W)), " "), cdcSalt)
            % CdcDivisor === 0))
    def chunksOf(tk: Column, bp: Column): Column =
      transform(sequence(lit(1), size(bp)), { i =>
        val start = when(i === 1, lit(1))
          .otherwise(element_at(bp, (i - 1).cast("int")) + 1)
        array_join(
          slice(tk, start, element_at(bp, i.cast("int")) - start + 1), " ")
      })
    // coalesce: split(NULL) is a NULL array and explode(NULL) emits
    // NO rows — a NULL-text doc would silently vanish from the dup
    // report. As '' it contributes one empty chunk in both engines.
    val txt = coalesce(col("text"), lit(""))
    val chunks = flatten(transform(array(split(txt, " ")), tk =>
      flatten(transform(array(bpsOf(tk)), bp => chunksOf(tk, bp)))))
    docs
      .select(col("doc_id"),
        size(split(txt, " ")).cast("long").as("n_tokens"),
        explode(chunks).as("ctext"))
      .select(col("doc_id"), col("n_tokens"),
        md5(col("ctext")).as("sig"),
        (graft.functions.Portable.countSubstr(col("ctext"), " ") + 1)
          .as("ctok"))
  }

  def cdcDedupFrom(docs: DataFrame): DataFrame = {
    val perChunk = cdcChunks(docs)
    val occ = perChunk.groupBy("sig").agg(count(lit(1)).as("occ"))
    perChunk.join(occ, Seq("sig"))
      .groupBy("doc_id")
      .agg(first(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("occ") >= 2, col("ctok")).otherwise(0L))
          .as("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        col("dup_chunks"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Deterministic 20% hash split standing in for "a new crawl batch
    * arrives" — the H4 BatchSalt device at chunk grain. */
  private val cdcBatchSalt = "cdcbatch"
  private[graft] def isCdcNew(c: Column): Column =
    Sampling.hashBucket(c, cdcBatchSalt) < Sampling.pctThreshold(20)

  // ---------------------------------------------------------------- X2
  /** X2: INCREMENTAL content-defined dedup — a new batch of docs
    * against the EXISTING corpus at chunk grain (H4's asymmetric
    * new-vs-old shape lifted to X1's chunks): a new doc's chunk is
    * duplicated iff its signature already exists in the old corpus's
    * chunk index. New-vs-new duplication is the batch's own
    * [[cdcDedupFrom]] pass — composable, out of scope here by the H4
    * rule. At scale the old side is a PERSISTED distinct-signature
    * index (written once, bucketed on sig); per batch only the new
    * chunks shuffle to probe it. */
  def cdcDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    cdcDedupIncrementalFrom(
      docs.where(!isCdcNew(col("doc_id"))),
      docs.where(isCdcNew(col("doc_id"))))
  }

  def cdcDedupIncrementalFrom(oldDocs: DataFrame,
                              newDocs: DataFrame): DataFrame = {
    val oldSigs = cdcChunks(oldDocs).select("sig").distinct()
      .withColumn("hit", lit(true))
    cdcChunks(newDocs).join(oldSigs, Seq("sig"), "left")
      .groupBy("doc_id")
      .agg(first(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("hit"), col("ctok")).otherwise(0L)).as("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        col("dup_chunks"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  def cdcDedupIncrementalSql: String = {
    val isNew = s"${Sampling.hashBucketSql("CAST(doc_id AS VARCHAR)", cdcBatchSalt)}" +
      s" < ${Sampling.pctThreshold(20)}"
    val chunksCtes = cdcChunksSqlCtes()
    s"""WITH $chunksCtes,
      |oldsig AS (SELECT DISTINCT sig FROM pc WHERE NOT ($isNew)),
      |np AS (SELECT * FROM pc WHERE $isNew)
      |SELECT np.doc_id, np.n_tokens AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN o.sig IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dup_chunks,
      |  CAST(sum(CASE WHEN o.sig IS NOT NULL THEN ctok ELSE 0 END) AS BIGINT)
      |    AS dup_tokens,
      |  round(CAST(sum(CASE WHEN o.sig IS NOT NULL THEN ctok ELSE 0 END)
      |          AS DOUBLE) / np.n_tokens, 6) AS dup_frac
      |FROM np LEFT JOIN oldsig o ON np.sig = o.sig
      |GROUP BY np.doc_id, np.n_tokens
      |ORDER BY np.doc_id""".stripMargin
  }

  /** The shared chunk-grain CTE chain (t → b → ix → pc): one row per
    * content-defined chunk, the twin of [[cdcChunks]]. */
  private[operators] def cdcChunksSqlCtes(from: String = "documents"): String = {
    val W = CdcWindow
    val gram = s"array_to_string(toks[p - ${W - 1}:p], ' ')"
    val bucket = Sampling.hashBucketSql(s"($gram)", cdcSalt)
    val start = "(CASE WHEN i = 1 THEN 1 ELSE bps[i - 1] + 1 END)"
    val ctext = s"array_to_string(toks[$start:bps[i]], ' ')"
    s"""t AS (
      |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks,
      |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n
      |  FROM $from),
      |b AS (
      |  SELECT doc_id, toks, n,
      |    list_filter(range(1, n + 1), p -> p = n
      |      OR (p >= $W AND $bucket % $CdcDivisor = 0)) AS bps
      |  FROM t),
      |ix AS (
      |  SELECT doc_id, toks, n, bps,
      |    generate_subscripts(bps, 1) AS i
      |  FROM b),
      |pc AS (
      |  SELECT doc_id, n AS n_tokens, md5($ctext) AS sig,
      |    CAST(bps[i] - $start + 1 AS BIGINT) AS ctok
      |  FROM ix)""".stripMargin
  }

  def cdcDedupSql: String = {
    s"""WITH ${cdcChunksSqlCtes()},
      |occ AS (SELECT sig, count(*) AS occ FROM pc GROUP BY sig)
      |SELECT pc.doc_id, pc.n_tokens AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN occ.occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dup_chunks,
      |  CAST(sum(CASE WHEN occ.occ >= 2 THEN ctok ELSE 0 END) AS BIGINT)
      |    AS dup_tokens,
      |  round(CAST(sum(CASE WHEN occ.occ >= 2 THEN ctok ELSE 0 END)
      |          AS DOUBLE) / pc.n_tokens, 6) AS dup_frac
      |FROM pc JOIN occ USING (sig)
      |GROUP BY pc.doc_id, pc.n_tokens
      |ORDER BY pc.doc_id""".stripMargin
  }
}
