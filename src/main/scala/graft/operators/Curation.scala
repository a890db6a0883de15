package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** H8: the end-to-end curation funnel — the composed "what actually
  * ships to training" query: quality gate (E2) ∧ exact-dedup
  * canonical only (C1) ∧ not benchmark-contaminated (H1), as ONE
  * declarative plan. The point is composability: each stage is the
  * already-verified operator, Catalyst fuses the narrow parts and
  * picks semi/anti join strategies, and the funnel inherits every
  * stage's scale shape (no new shuffles beyond the stages' own).
  */
object Curation {

  private val MinQuality = 0.5

  /** Self-contained form: recomputes each stage from the raw table.
    * Right for a one-shot query (and for the oracle, which nests the
    * stages' own SQL); a production funnel at 100 TB runs the stages
    * once, persists their outputs, and feeds them to [[curateFrom]] —
    * recomputing decontamination inside every downstream query would
    * repeat its corpus pass per consumer. */
  def curate(spark: SparkSession, dir: String): DataFrame =
    curateFrom(
      Tables.documents(spark, dir),
      TextAnalysis.quality(spark, dir),
      Dedup.exact(spark, dir),
      Dedup.decontaminate(spark, dir))

  /** The funnel over MATERIALIZED stage outputs (pass persisted/
    * written frames with the stages' own schemas): quality gate ∧
    * exact-dedup canonical ∧ not contaminated. Identical output to
    * [[curate]] by construction — `curate` is this applied to freshly
    * computed stages. */
  def curateFrom(documents: DataFrame, quality: DataFrame,
                 exactDedup: DataFrame, decontaminated: DataFrame): DataFrame = {
    val canonical = exactDedup.where(!col("is_dup")).select("doc_id")
    val contaminated = decontaminated
      .where(col("contaminated")).select("doc_id").distinct()
    documents.select("doc_id", "lang", "source")
      .join(quality.select("doc_id", "n_tokens", "quality_score"), "doc_id")
      .where(col("quality_score") >= MinQuality)
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Oracle: the stages' own verified SQL, composed as subqueries —
    * the funnel can't drift from its parts. */
  val curateSql: String =
    s"""SELECT d.doc_id, d.lang, d.source, q.n_tokens, q.quality_score
      |FROM documents d
      |JOIN (SELECT doc_id, n_tokens, quality_score
      |      FROM (${TextAnalysis.qualitySql}) qq) q ON q.doc_id = d.doc_id
      |WHERE q.quality_score >= $MinQuality
      |  AND EXISTS (SELECT 1 FROM (${Dedup.exactSql}) e
      |              WHERE e.doc_id = d.doc_id AND NOT e.is_dup)
      |  AND NOT EXISTS (SELECT 1 FROM (${Dedup.decontaminateSql}) c
      |                  WHERE c.doc_id = d.doc_id AND c.contaminated)
      |ORDER BY d.doc_id""".stripMargin
}
