package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** L1 + L3: survivor-selection operators — "which docs make the cut"
  * decisions that rank WITHIN a group rather than gate on a global
  * constant (H8's `quality_score >= 0.5` is the global form).
  *
  * L1 [[qualityTopFrac]]: per-source adaptive quality gate — keep the
  * top p/q fraction of each source by quality score (the FineWeb-style
  * "keep the best 30% of every crawl" curation move; a fixed global
  * threshold over-prunes clean sources and under-prunes noisy ones).
  * The cut is a RANK, not a score threshold: rank within source by
  * (quality_score DESC, doc_id) and keep rn·q ≤ p·n_src + (q-1)·…,
  * all integer arithmetic — cross-engine exact, no float percentile
  * interpolation anywhere (reference behavior: kinesis2sse has no
  * curation tier; this extends H8/E2 which the reference also lacks).
  *
  * L3 [[clusterRepresentatives]]: quality-ranked canonical selection —
  * G4's dup clusters keep the MIN-ID member; a training pipeline wants
  * the BEST member (highest quality score) as the surviving
  * representative. rank=1 per cluster is a constant-limit quota, so
  * Catalyst plans it as WindowGroupLimit: each task pre-filters to 1
  * candidate row per cluster before the exchange.
  *
  * Scale notes (100 TB):
  * - L1's exact form shuffles once on `source` and sorts each source
  *   partition — with few giant sources the per-source sort serializes
  *   on single tasks. [[qualityThresholdApprox]] is the production
  *   path at that scale: a per-source quantile SKETCH (H7's bounded-
  *   error machinery, #sources output rows) broadcast back as a score
  *   threshold filter — one tiny agg plus a narrow map-side filter, no
  *   full sort. SelectionSpec gates how the two relate: every
  *   disagreement doc sits inside the sketch's error band around the
  *   exact cut score.
  * - L3 inherits the dup-cluster pipeline's shape; the added window
  *   moves one exchange on cluster_id of (cluster_id, score, id)
  *   triples — cluster frames only, never text.
  */
object Selection {

  /** Keep fraction as an exact rational: KeepNum/KeepDen = 30%. */
  private val KeepNum = 3L
  private val KeepDen = 10L

  /** L1 exact form over materialized stage outputs: per-source rank by
    * (quality_score DESC, doc_id), keep rn ≤ ceil(n_src · p / q). */
  def qualityTopFracFrom(documents: DataFrame, quality: DataFrame): DataFrame = {
    val wRank = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val wAll = Window.partitionBy("source")
    documents.select("doc_id", "source")
      .join(quality.select("doc_id", "quality_score"), "doc_id")
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n_src", count(lit(1)).over(wAll))
      // rn <= ceil(n·p/q)  ⇔  rn·q <= n·p + (q-1), integers only
      .where(col("rk") * KeepDen <= col("n_src") * KeepNum + (KeepDen - 1))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("rk"), col("n_src"))
      .orderBy("doc_id")
  }

  def qualityTopFrac(spark: SparkSession, dir: String): DataFrame =
    qualityTopFracFrom(Tables.documents(spark, dir),
      TextAnalysis.quality(spark, dir))

  /** Strip ONLY a trailing total-order clause when nesting a verified
    * query as a subselect — window-internal `ORDER BY doc_id` (e.g. the
    * bucket-cap row_number inside the LSH CTEs) must survive. */
  private def nested(sql: String): String =
    sql.replaceAll("ORDER BY doc_id\\s*$", "")

  val qualityTopFracSql: String =
    s"""SELECT doc_id, source, quality_score, rk, n_src FROM (
      |  SELECT d.doc_id, d.source, q.quality_score,
      |    row_number() OVER (PARTITION BY d.source
      |      ORDER BY q.quality_score DESC, d.doc_id) AS rk,
      |    count(*) OVER (PARTITION BY d.source) AS n_src
      |  FROM documents d
      |  JOIN (${nested(TextAnalysis.qualitySql)}) q
      |    ON q.doc_id = d.doc_id) t
      |WHERE rk * $KeepDen <= n_src * $KeepNum + ${KeepDen - 1}
      |ORDER BY doc_id""".stripMargin

  /** L1 production path: per-source approximate score threshold from a
    * bounded-error quantile sketch, broadcast back as a map-side
    * filter. No per-source sort anywhere — the only wide op is the
    * #sources-row sketch agg. Returns the same columns minus ranks
    * (a threshold filter has no rank). `accuracy` is Spark's
    * percentile_approx knob (error ≤ 1/accuracy of rank). */
  def qualityThresholdApprox(spark: SparkSession, dir: String,
                             accuracy: Int = 10000): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
      .join(TextAnalysis.quality(spark, dir)
        .select("doc_id", "quality_score"), "doc_id")
    val frac = KeepNum.toDouble / KeepDen
    val thr = docs.groupBy("source")
      .agg(percentile_approx(col("quality_score"), lit(1.0 - frac),
        lit(accuracy)).as("thr"))
    docs.join(broadcast(thr), "source")
      .where(col("quality_score") >= col("thr"))
      .select("doc_id", "source", "quality_score")
  }

  /** L3: the highest-quality member of each near-dup cluster (tie →
    * smallest doc_id). One WindowGroupLimit exchange over the cluster
    * label frame. */
  def clusterRepresentativesFrom(clusters: DataFrame, quality: DataFrame): DataFrame = {
    val wRank = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val wAll = Window.partitionBy("cluster_id")
    // n_members FIRST so the rk filter sits directly above the rank
    // window — that adjacency is what lets Catalyst rewrite it to
    // WindowGroupLimit (constant limit 1, per-task pre-filter); both
    // windows share the cluster_id partitioning, one exchange total
    clusters.select("doc_id", "cluster_id")
      .join(quality.select("doc_id", "quality_score"), "doc_id")
      .withColumn("n_members", count(lit(1)).over(wAll))
      .withColumn("rk", row_number().over(wRank))
      .where(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc"),
        col("quality_score").as("rep_quality"), col("n_members"))
      .orderBy("cluster_id")
  }

  def clusterRepresentatives(spark: SparkSession, dir: String): DataFrame =
    clusterRepresentativesFrom(Dedup.dupClusters(spark, dir),
      TextAnalysis.quality(spark, dir))

  /** Oracle: G4's recursive-CTE clusters joined to E2's quality SQL,
    * ranked the same way. */
  val clusterRepresentativesSql: String = {
    // dupClustersSql is a complete WITH RECURSIVE … SELECT; nest it.
    s"""SELECT cluster_id, doc_id AS rep_doc, quality_score AS rep_quality,
      |  n_members
      |FROM (
      |  SELECT c.cluster_id, c.doc_id, q.quality_score,
      |    row_number() OVER (PARTITION BY c.cluster_id
      |      ORDER BY q.quality_score DESC, c.doc_id) AS rk,
      |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members
      |  FROM (${nested(Dedup.dupClustersSql)}) c
      |  JOIN (${nested(TextAnalysis.qualitySql)}) q
      |    ON q.doc_id = c.doc_id) t
      |WHERE rk = 1
      |ORDER BY cluster_id""".stripMargin
  }

  // ---------------------------------------------------------------- Z2
  /** Histogram bins for the quantile transform (fixed thousandths of
    * [0,1] — fixed edges keep a doc's bin a pure function of its text,
    * the Y4 discipline). */
  val QnormBins = 1000
  /** Global keep percentile for the demonstration gate (top 20%). */
  private val QnormKeepNum = 4L // keep iff pct_num·5 > pct_den·4
  private val QnormKeepDen = 5L

  /** Z2: per-source quantile NORMALIZATION of the quality score — the
    * rank-transform that makes one global threshold mean the same
    * thing on every source (the CCNet per-language-bucket device,
    * Wenzek et al. 2020, generalized from terciles to a full
    * percentile: raw score distributions differ per source, so a
    * global raw cut over-prunes clean sources; L1 fixes that with a
    * per-source keep FRACTION — this emits the comparable per-doc
    * PERCENTILE itself, for downstream consumers that weight, mix, or
    * threshold across sources).
    *
    * The percentile is the histogram HAZEN POSITION (rank_mid − ½)/n:
    * bin the score into [[QnormBins]] fixed bins, count per
    * (source, bin), and read
    * pct = (2·cum_below + n_bin) / (2·n_src) — a pure function of
    * (source, bin) from exact integers, so unlike a row_number
    * percent-rank it needs NO per-source sort of the corpus: one
    * narrow scan into a bounded (#sources × bins) count table, a
    * window over that bounded table, and a broadcast join back.
    * Resolution is 1/[[QnormBins]] of the score scale, the standard
    * histogram-quantile trade (H7's sketch bound, exact here because
    * bins are fixed). The keep gate is integer cross-multiplied. */
  def qualityQnorm(spark: SparkSession, dir: String): DataFrame =
    qualityQnormFrom(Tables.documents(spark, dir))

  private def qnormBin: Column = {
    val score = TextAnalysis.qualityScore(col("text"))
    least(floor(score * QnormBins).cast("int"), lit(QnormBins - 1))
  }

  /** The bounded (source, bin) → (n_src, num) percentile table — the
    * persistable reference artifact of the streaming scorer (Z6, the
    * M3 frozen-artifact convention: a stream cannot know corpus-wide
    * ranks; the table refreshes on the batch cadence). */
  def qnormTableFrom(docs: DataFrame): DataFrame = {
    val counts = docs.select(col("source"), qnormBin.as("bin"))
      .groupBy("source", "bin").agg(count(lit(1L)).as("c"))
    val wCum = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("source")
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_src", sum(col("c")).over(wAll))
      // Hazen plotting position (rank_mid - 0.5)/n as exact integers:
      // num = 2·cum_below + c over denominator 2·n_src — strictly
      // inside (0,1) even for a unique min/max, unlike the raw midrank
      .select(col("source"), col("bin"), col("n_src"),
        (lit(2L) * (col("cum") - col("c")) + col("c")).as("num"))
  }

  /** Sort-free scorer over an arbitrary doc frame against a percentile
    * table: bin + broadcast join + exact-rational percentile. Works
    * unchanged on a STREAMING frame (stream-static join, zero state),
    * so the Z6 streaming gate IS this function — stream and batch
    * cannot diverge (pinned in ZSeriesSpec).
    *
    * The join is LEFT so a doc whose (source, bin) is absent from a
    * STALE table (Z6: a new source, or a score bin the frozen batch
    * never populated) is observable rather than silently dropped: it
    * rides through with pct_norm NULL, n_src 0, keep_top false — the
    * null percentile is the refresh signal. In the batch form the
    * table comes from the same docs, so no row is unmatched and the
    * left join is exactly the old inner join. */
  def qnormScore(docs: DataFrame, table: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), qnormBin.as("bin"))
      .join(broadcast(table), Seq("source", "bin"), "left")
      .select(col("doc_id"), col("source"), col("bin"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        round(col("num").cast("double") / (lit(2.0) * col("n_src")), 9)
          .as("pct_norm"),
        coalesce(
          col("num") * QnormKeepDen > lit(2L) * col("n_src") * QnormKeepNum,
          lit(false)).as("keep_top"))

  def qualityQnormFrom(docs: DataFrame): DataFrame =
    qnormScore(docs, qnormTableFrom(docs)).orderBy("doc_id")

  def qualityQnormSql: String = {
    val q = TextAnalysis.qualityScoreSql("text")
    s"""WITH b AS (
      |  SELECT doc_id, source,
      |    least(CAST(floor($q * $QnormBins) AS INT), ${QnormBins - 1}) AS bin
      |  FROM documents),
      |cnt AS (
      |  SELECT source, bin, count(*) AS c
      |  FROM b GROUP BY source, bin),
      |tbl AS (
      |  SELECT source, bin,
      |    sum(c) OVER (PARTITION BY source) AS n_src,
      |    2 * (sum(c) OVER (PARTITION BY source ORDER BY bin
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
      |      + c AS num
      |  FROM cnt)
      |SELECT b.doc_id, b.source, b.bin,
      |  coalesce(CAST(t.n_src AS BIGINT), 0) AS n_src,
      |  round(CAST(t.num AS DOUBLE) / (2.0 * t.n_src), 9) AS pct_norm,
      |  coalesce(t.num * $QnormKeepDen > 2 * t.n_src * $QnormKeepNum, false)
      |    AS keep_top
      |FROM b LEFT JOIN tbl t ON t.source = b.source AND t.bin = b.bin
      |ORDER BY b.doc_id""".stripMargin
  }
}
