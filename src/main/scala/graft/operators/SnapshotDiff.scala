package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** K9: corpus snapshot diff — the CDC read between two versions of a
  * document table: which docs were ADDED, REMOVED, or CHANGED
  * (same id, different content) since the last snapshot. The step a
  * recurring training pipeline runs first: everything downstream
  * (incremental dedup H4/I6, drift K6, re-chunking K1) wants the
  * delta, not the corpus.
  *
  * Content identity is md5(text) so the compare never ships text —
  * the full-outer join carries (doc_id, 32-byte digest) per side,
  * ~10⁻⁶ of corpus bytes at training-data text sizes. Unchanged docs
  * (the overwhelming majority at 100 TB) are dropped BEFORE anything
  * wider than the digest pair exists.
  *
  * Scale shape: one shuffle each side on doc_id (the join key),
  * digests computed map-side; the output is delta-sized. At 100 TB
  * with date/source-partitioned snapshots (J2) the join prunes to
  * the partitions both snapshots share.
  *
  * The fixture has one snapshot, so [[qSnapshotDiff]] synthesizes the
  * "old" version deterministically (J5's salted-hash machinery): docs
  * with bucket < 1/8 are treated as since-added (absent from old),
  * bucket ≥ 7/8 as since-removed (present only in old), and a middle
  * band has old text = reversed new text (changed). The synthesis is
  * value-hash arithmetic, so the DuckDB oracle reconstructs the same
  * old snapshot exactly.
  */
object SnapshotDiff {

  /** Generic form: diff two (id, text) frames. NULL text is digested
    * as a control-byte sentinel (not as SQL NULL) so a doc with NULL
    * text in BOTH snapshots reads "unchanged" and a NULL→'x'
    * transition reads "changed" — without the coalesce, a NULL digest
    * on the old side is indistinguishable from an absent row and the
    * doc would be misreported "added". (A doc whose text is literally
    * the one-byte 0x01 string collides with the sentinel; real corpora
    * don't carry bare control-byte documents. 0x01 rather than NUL
    * because DuckDB VARCHARs can't hold NUL, and the twin must
    * match.) */
  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit("\u0001"))
    val o = oldDocs.select(col(idCol).as("id"), md5(t).as("old_digest"))
    val n = newDocs.select(col(idCol).as("id"), md5(t).as("new_digest"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("change",
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed"))
      .where(col("change").isNotNull)
      .select(col("id").as("doc_id"), col("change"))
  }

  private val AddBand = 65536 / 8       // bucket < this: added since old
  private val RemoveBand = 65536 * 7 / 8 // bucket >= this: removed
  private val ChangeLo = 65536 * 3 / 8
  private val ChangeHi = 65536 * 4 / 8  // [lo, hi): changed content

  /** The fixture's deterministic (old, new) snapshot pair — shared by
    * the K9 query and L4's maintenance spec. */
  private[graft] def synthOldNew(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir)
      .withColumn("bucket", Sampling.hashBucket(col("doc_id"), "snapshot"))
    val oldDocs = docs
      .where(col("bucket") >= AddBand) // added docs absent from old
      .withColumn("text",
        when(col("bucket") >= ChangeLo && col("bucket") < ChangeHi,
          reverse(col("text"))).otherwise(col("text")))
    val newDocs = docs.where(col("bucket") < RemoveBand)
    // source rides along for the stats-maintenance specs (K5/K6 under
    // CDC); diff() and the L4 path project what they need
    (oldDocs.select("doc_id", "source", "text"),
      newDocs.select("doc_id", "source", "text"))
  }

  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val (oldDocs, newDocs) = synthOldNew(spark, dir)
    diff(oldDocs, newDocs).orderBy("doc_id")
  }

  /** L4: delta-driven maintenance of the exact-dedup verdict table —
    * the incremental form of C1 under snapshot CDC. Given the OLD
    * snapshot's verdicts (C1 schema: doc_id, sig, canonical_id,
    * group_size, is_dup), the NEW corpus, and the [[diff]] delta,
    * produce the NEW snapshot's verdicts while reading text ONLY for
    * delta docs:
    *
    *  - signatures for added/changed docs come from a delta-pruned
    *    pass over the new corpus (semi join on the delta ids — with a
    *    partitioned layout that is file pruning, J2);
    *  - a signature GROUP is touched iff a delta doc enters or leaves
    *    it; untouched groups' members come from the old verdict rows
    *    REUSED VERBATIM — their sigs are already materialized there,
    *    so no untouched text is ever re-hashed (the manifest-reuse
    *    idea of K8 applied to verdict state);
    *  - touched groups re-window over (surviving old members ∪ delta
    *    members): a removed canonical hands the crown to the next min
    *    id, an added smaller id takes it — both fall out of the same
    *    min/count recompute.
    *
    * Work is O(delta + touched groups), never a corpus re-hash. The
    * spec proves the contract the K8 way: it poisons the text of every
    * non-delta doc and the output must still equal the intact full
    * rebuild. */
  def maintainExactDedup(oldVerdicts: DataFrame, newDocs: DataFrame,
                         delta: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gone = delta.where(col("change").isin("removed", "changed"))
      .select("doc_id")
    val arrived = delta.where(col("change").isin("added", "changed"))
      .select("doc_id")
    // delta-pruned signature pass: the ONLY place text is read
    val deltaSigs = newDocs.join(arrived, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.Portable.bagSignature(col("text")).as("sig"))
    val touchedSigs = deltaSigs.select("sig")
      .union(oldVerdicts.join(gone, Seq("doc_id"), "left_semi").select("sig"))
      .distinct()
    // old rows that survive into the new snapshot (drop removed AND
    // changed — changed docs re-enter through deltaSigs with new sigs)
    val surviving = oldVerdicts.join(gone, Seq("doc_id"), "left_anti")
    val untouched = surviving.join(touchedSigs, Seq("sig"), "left_anti")
      .select("doc_id", "sig", "canonical_id", "group_size", "is_dup")
    val pool = surviving.join(touchedSigs, Seq("sig"), "left_semi")
      .select("doc_id", "sig")
      .unionByName(deltaSigs)
    val w = Window.partitionBy("sig")
    val recomputed = pool
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "sig", "canonical_id", "group_size", "is_dup")
    untouched.unionByName(recomputed)
  }

  // ---------------------------------------------------------------- U8
  /** U8: CDC snapshot APPLY — the MERGE half of K9's diff read, and
    * the last piece of the CDC story (K9 computes the delta, L4/N6
    * maintain derived state under it; this materializes the next
    * BASE snapshot): `old − (removed ∪ changed) ∪ delta-payload
    * (added ∪ changed)`. Text is read ONLY for delta docs — survivors
    * are the old snapshot's rows verbatim (anti join), incoming rows
    * ride a semi join that a J2-partitioned layout turns into file
    * pruning. Work is O(|old| anti-join + |delta|), one co-partitioned
    * doc_id shuffle each side, never a corpus re-read of text; the
    * round-trip theorem apply(old, diff(old, new)) == new is pinned
    * set-exact by USeriesSpec, with the K8-style poison proof that
    * non-delta text is never consulted. */
  def applyDiff(oldDocs: DataFrame, deltaPayload: DataFrame,
                delta: DataFrame): DataFrame = {
    val gone = delta.where(col("change").isin("removed", "changed"))
      .select("doc_id")
    val incoming = delta.where(col("change").isin("added", "changed"))
      .select("doc_id")
    oldDocs.join(gone, Seq("doc_id"), "left_anti")
      .unionByName(deltaPayload.join(incoming, Seq("doc_id"), "left_semi"))
  }

  /** The oracle-gated query form over the synthesized (old, new) pair:
    * applies the freshly-computed diff and emits the next snapshot as
    * (doc_id, source, digest) — digest rather than text, because the
    * compare (like the diff itself) never needs to ship text. */
  def qSnapshotApply(spark: SparkSession, dir: String): DataFrame = {
    val (oldDocs, newDocs) = synthOldNew(spark, dir)
    applyDiff(oldDocs, newDocs, diff(oldDocs, newDocs))
      .select(col("doc_id"), col("source"),
        md5(coalesce(col("text"), lit("\u0001"))).as("digest"))
      .orderBy("doc_id")
  }

  val qSnapshotApplySql: String = {
    val b = Sampling.hashBucketSql("doc_id", "snapshot")
    s"""WITH docs AS (SELECT doc_id, source, text, $b AS bucket FROM documents),
      |old AS (
      |  SELECT doc_id, source,
      |    CASE WHEN bucket >= $ChangeLo AND bucket < $ChangeHi
      |         THEN reverse(text) ELSE text END AS text
      |  FROM docs WHERE bucket >= $AddBand),
      |new_ AS (SELECT doc_id, source, text FROM docs
      |         WHERE bucket < $RemoveBand),
      |od AS (SELECT doc_id, md5(coalesce(text, chr(1))) AS od FROM old),
      |nd AS (SELECT doc_id, md5(coalesce(text, chr(1))) AS nd FROM new_),
      |delta AS (
      |  SELECT coalesce(od.doc_id, nd.doc_id) AS doc_id,
      |    CASE WHEN od IS NULL THEN 'added'
      |         WHEN nd IS NULL THEN 'removed'
      |         WHEN od <> nd THEN 'changed' END AS change
      |  FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id
      |  WHERE od IS NULL OR nd IS NULL OR od <> nd)
      |SELECT doc_id, source, md5(coalesce(text, chr(1))) AS digest FROM (
      |  SELECT doc_id, source, text FROM old
      |  WHERE doc_id NOT IN (SELECT doc_id FROM delta
      |                       WHERE change IN ('removed', 'changed'))
      |  UNION ALL
      |  SELECT doc_id, source, text FROM new_
      |  WHERE doc_id IN (SELECT doc_id FROM delta
      |                   WHERE change IN ('added', 'changed')))
      |ORDER BY doc_id""".stripMargin
  }

  val qSnapshotDiffSql: String = {
    val b = Sampling.hashBucketSql("doc_id", "snapshot")
    s"""WITH docs AS (SELECT doc_id, text, $b AS bucket FROM documents),
      |old AS (
      |  SELECT doc_id, CASE WHEN bucket >= $ChangeLo AND bucket < $ChangeHi
      |                      THEN reverse(text) ELSE text END AS text
      |  FROM docs WHERE bucket >= $AddBand),
      |new_ AS (SELECT doc_id, text FROM docs WHERE bucket < $RemoveBand),
      |od AS (SELECT doc_id, md5(coalesce(text, chr(1))) AS od FROM old),
      |nd AS (SELECT doc_id, md5(coalesce(text, chr(1))) AS nd FROM new_),
      |j AS (
      |  -- coalesce PER SIDE, BEFORE the join (as the Spark form does):
      |  -- after the join a NULL from row-absence and a NULL text value
      |  -- are indistinguishable and absence would read 'changed'
      |  SELECT coalesce(od.doc_id, nd.doc_id) AS doc_id, od.od, nd.nd
      |  FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id)
      |SELECT doc_id,
      |  CASE WHEN od IS NULL THEN 'added'
      |       WHEN nd IS NULL THEN 'removed'
      |       WHEN od <> nd THEN 'changed' END AS change
      |FROM j
      |WHERE od IS NULL OR nd IS NULL OR od <> nd
      |ORDER BY doc_id""".stripMargin
  }
}
