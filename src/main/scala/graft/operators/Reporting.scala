package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** M1 + M2: pipeline observability — the two artifacts a 100 TB
  * curation run publishes alongside its output shards.
  *
  * M1 [[corpusReport]]: the per-source "data card" row — corpus size,
  * how much each filter stage would remove, token mass, and the K6
  * drift score, as ONE query composed from the already-verified stage
  * operators. Every rate column is an INTEGER count (rates divide out
  * downstream); the only doubles are K6's tv_distance, whose
  * integer-numerator identity is already oracle-green on its own.
  *
  * M2 [[dropLedger]]: per-document drop PROVENANCE — for every doc
  * that any stage would remove, the highest-priority reason
  * (contaminated ≻ exact_dup ≻ near_dup ≻ semantic_dup ≻ low_quality).
  * The audit artifact behind "why is doc X not in the training set?",
  * and the input to recall accounting when a filter is retuned.
  *
  * Scale shape: both are unions/joins of per-doc verdict frames the
  * stages already produce — at 100 TB each stage's output is
  * materialized once (the `curateFrom` discipline) and these reads
  * are delta-free column scans; the report's final aggregate is
  * #sources rows, the ledger is drop-set-sized. Nothing here adds a
  * corpus-scale shuffle beyond the stages' own.
  */
object Reporting {

  /** Strip a trailing total-order clause when nesting verified SQL;
    * window-internal ORDER BYs survive (anchored at end-of-string). */
  private def nested(sql: String): String =
    sql.replaceAll("ORDER BY [a-zA-Z_][a-zA-Z_, ]*\\s*$", "")

  /** Build the composites' independent stage frames CONCURRENTLY
    * (guide: overlap independent jobs — actions are only sequential
    * because the driver calls them sequentially). Each thunk
    * materializes one stage (localCheckpoint, or an internally-eager
    * trainer/propagation loop); running them from a small pool lets
    * one stage's tail back-fill the cores another stage's driver-side
    * step leaves idle. Values are unchanged — same frames, same
    * compose — only the driver-side serialization goes. */
  private[operators] def parStages(thunks: (() => DataFrame)*): Seq[DataFrame] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = thunks.map(t => Future(t()))
    futs.map(Await.result(_, Duration.Inf))
  }

  private val QualityBar = 0.5

  // ---------------------------------------------------------------- M1
  /** Self-contained form (recomputes every stage — at 10× it IS the
    * sum of its five stages' costs; the bench prices it that way).
    * Production runs the stages once, persists, and calls
    * [[corpusReportFrom]] — identical by construction, equality
    * pinned in MSeriesSpec. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    // stages materialize concurrently ([[parStages]]): dupClusters'
    // propagation loop and the four declarative stages are mutually
    // independent, and serial construction paid their sum (measured
    // 4.1 -> 3.0 s at sf0.1); each declarative stage localCheckpoints
    // so its build runs NOW, overlapped — the compose then reads
    // materialized frames exactly like the from-form reads parquet
    val Seq(q, e, c, de, dr) = parStages(
      () => TextAnalysis.quality(spark, dir).localCheckpoint(),
      () => Dedup.exact(spark, dir).localCheckpoint(),
      () => Dedup.dupClusters(spark, dir),
      () => Dedup.decontaminate(spark, dir).localCheckpoint(),
      () => CorpusStats.sourceDrift(spark, dir).localCheckpoint())
    corpusReportFrom(Tables.documents(spark, dir), q, e, c, de, dr)
  }

  /** The report over MATERIALIZED stage outputs (stages' own
    * schemas). Only this composition's joins/aggregate run — column
    * scans of persisted frames, #sources output rows. */
  def corpusReportFrom(documents: DataFrame, quality: DataFrame,
                       exactDedup: DataFrame, dupClusters: DataFrame,
                       decontaminated: DataFrame, drift: DataFrame): DataFrame = {
    val docs = documents.select("doc_id", "source")
    val lowq = quality
      .select(col("doc_id"), col("n_tokens"),
        (col("quality_score") < QualityBar).as("low_quality"))
    val exact = exactDedup.select("doc_id", "is_dup")
    val near = dupClusters
      .where(!col("is_canonical")).select(col("doc_id"), lit(true).as("near"))
    val cont = decontaminated
      .where(col("contaminated")).select("doc_id").distinct()
      .withColumn("cont", lit(true))
    docs
      .join(lowq, "doc_id")
      .join(exact, "doc_id")
      .join(near, Seq("doc_id"), "left_outer")
      .join(cont, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("low_quality"), 1L).otherwise(0L)).as("n_low_quality"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("near"), 1L).otherwise(0L)).as("n_near_dup"),
        sum(when(col("cont"), 1L).otherwise(0L)).as("n_contaminated"),
        sum(col("n_tokens")).as("total_tokens"))
      .join(drift.select("source", "tv_distance"), "source")
      .select("source", "n_docs", "n_low_quality", "n_exact_dup",
        "n_near_dup", "n_contaminated", "total_tokens", "tv_distance")
      .orderBy("source")
  }

  val corpusReportSql: String =
    s"""WITH q AS (${nested(TextAnalysis.qualitySql)}),
      |e AS (${nested(Dedup.exactSql)}),
      |nd AS (SELECT doc_id FROM (${nested(Dedup.dupClustersSql)}) c
      |       WHERE NOT is_canonical),
      |ct AS (SELECT DISTINCT doc_id FROM (${nested(Dedup.decontaminateSql)}) x
      |       WHERE contaminated),
      |dr AS (${nested(CorpusStats.sourceDriftSql)})
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN q.quality_score < $QualityBar THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_low_quality,
      |  CAST(sum(CASE WHEN e.is_dup THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_exact_dup,
      |  CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_near_dup,
      |  CAST(sum(CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contaminated,
      |  CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
      |  min(dr.tv_distance) AS tv_distance
      |FROM documents d
      |JOIN q ON q.doc_id = d.doc_id
      |JOIN e ON e.doc_id = d.doc_id
      |LEFT JOIN nd ON nd.doc_id = d.doc_id
      |LEFT JOIN ct ON ct.doc_id = d.doc_id
      |JOIN dr ON dr.source = d.source
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  // ---------------------------------------------------------------- M2
  /** Reason priorities; smaller wins when a doc trips several stages. */
  private val Reasons = Seq(
    1 -> "contaminated", 2 -> "exact_dup", 3 -> "near_dup",
    4 -> "semantic_dup", 5 -> "low_quality")

  /** Self-contained form (recomputes all five stages; its bench cost
    * IS the stage sum — the 10× measurement that motivated
    * [[dropLedgerFrom]]). */
  def dropLedger(spark: SparkSession, dir: String): DataFrame = {
    // concurrent stage builds ([[parStages]]): the two internally-
    // eager stages — the semantic trainer behind pinnedDrops and
    // dupClusters' propagation loop — used to run back to back on the
    // driver; overlapped they cost max(), not sum() (measured
    // 5.5 -> 3.8 s at sf0.1)
    val Seq(de, e, c, sem, q) = parStages(
      () => Dedup.decontaminate(spark, dir).localCheckpoint(),
      () => Dedup.exact(spark, dir).localCheckpoint(),
      () => Dedup.dupClusters(spark, dir),
      () => Pipeline.pinnedDrops(spark, dir),
      () => TextAnalysis.quality(spark, dir).localCheckpoint())
    dropLedgerFrom(de, e, c, sem, q)
  }

  /** The ledger over MATERIALIZED stage outputs: a union of five
    * drop-set-sized column scans and one groupBy on doc_id. */
  def dropLedgerFrom(decontaminated: DataFrame, exactDedup: DataFrame,
                     dupClusters: DataFrame, semanticDrops: DataFrame,
                     quality: DataFrame): DataFrame = {
    val cont = decontaminated
      .where(col("contaminated")).select("doc_id").distinct()
      .select(col("doc_id"), lit(1).as("pri"))
    val exact = exactDedup.where(col("is_dup"))
      .select(col("doc_id"), lit(2).as("pri"))
    val near = dupClusters.where(!col("is_canonical"))
      .select(col("doc_id"), lit(3).as("pri"))
    val sem = semanticDrops
      .select(col("doc_id"), lit(4).as("pri"))
    val lowq = quality
      .where(col("quality_score") < QualityBar)
      .select(col("doc_id"), lit(5).as("pri"))
    val reason = Reasons.tail.foldLeft(
      when(col("pri") === Reasons.head._1, Reasons.head._2)) {
      case (acc, (p, r)) => acc.when(col("pri") === p, r)
    }
    cont.unionByName(exact).unionByName(near).unionByName(sem).unionByName(lowq)
      .groupBy("doc_id").agg(min(col("pri")).as("pri"))
      .select(col("doc_id"), reason.as("reason"))
      .orderBy("doc_id")
  }

  /** Oracle: each stage's verified SQL contributes its drop arm; the
    * semantic stage embeds the RUN's drop list (the Pipeline/J1
    * [[OracleModelCache]] device — k-means is not SQL-expressible), so
    * this twin is valid at every SF. A def: the list must be resolved
    * at DUMP time, after the queries ran. */
  def dropLedgerSql: String = {
    val ids = Pipeline.oracleDropIds
    val semArm =
      if (ids.isEmpty) ""
      else ids
        .map(id => s"($id, 4)").mkString(
          "  UNION ALL SELECT * FROM (VALUES ", ", ", ") sem(doc_id, pri)\n")
    val caseExpr = Reasons
      .map { case (p, r) => s"WHEN pri = $p THEN '$r'" }
      .mkString("CASE ", " ", " END")
    s"""WITH drops AS (
      |  SELECT doc_id, 1 AS pri FROM (
      |    SELECT DISTINCT doc_id FROM (${nested(Dedup.decontaminateSql)}) x
      |    WHERE contaminated) c
      |  UNION ALL SELECT doc_id, 2 FROM (${nested(Dedup.exactSql)}) e
      |    WHERE is_dup
      |  UNION ALL SELECT doc_id, 3 FROM (${nested(Dedup.dupClustersSql)}) n
      |    WHERE NOT is_canonical
      |$semArm  UNION ALL SELECT doc_id, 5 FROM (${nested(TextAnalysis.qualitySql)}) q
      |    WHERE quality_score < $QualityBar)
      |SELECT doc_id, $caseExpr AS reason
      |FROM (SELECT doc_id, min(pri) AS pri FROM drops GROUP BY doc_id) t
      |ORDER BY doc_id""".stripMargin
  }
}
