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

  /** Generic form: diff two (id, text) frames. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol).as("id"), md5(col(textCol)).as("old_digest"))
    val n = newDocs.select(col(idCol).as("id"), md5(col(textCol)).as("new_digest"))
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

  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("bucket", Sampling.hashBucket(col("doc_id"), "snapshot"))
    val oldDocs = docs
      .where(col("bucket") >= AddBand) // added docs absent from old
      .withColumn("text",
        when(col("bucket") >= ChangeLo && col("bucket") < ChangeHi,
          reverse(col("text"))).otherwise(col("text")))
    val newDocs = docs.where(col("bucket") < RemoveBand)
    diff(oldDocs, newDocs).orderBy("doc_id")
  }

  val qSnapshotDiffSql: String = {
    val b = Sampling.hashBucketSql("doc_id", "snapshot")
    s"""WITH docs AS (SELECT doc_id, text, $b AS bucket FROM documents),
      |old AS (
      |  SELECT doc_id, CASE WHEN bucket >= $ChangeLo AND bucket < $ChangeHi
      |                      THEN reverse(text) ELSE text END AS text
      |  FROM docs WHERE bucket >= $AddBand),
      |new_ AS (SELECT doc_id, text FROM docs WHERE bucket < $RemoveBand),
      |j AS (
      |  SELECT coalesce(old.doc_id, new_.doc_id) AS doc_id,
      |    md5(old.text) AS od, md5(new_.text) AS nd
      |  FROM old FULL OUTER JOIN new_ ON old.doc_id = new_.doc_id)
      |SELECT doc_id,
      |  CASE WHEN od IS NULL THEN 'added'
      |       WHEN nd IS NULL THEN 'removed'
      |       WHEN od <> nd THEN 'changed' END AS change
      |FROM j
      |WHERE od IS NULL OR nd IS NULL OR od <> nd
      |ORDER BY doc_id""".stripMargin
  }
}
