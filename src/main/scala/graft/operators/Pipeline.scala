package graft.operators

import scala.io.Source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** J1: the end-to-end TRAINING-SET pipeline — the composed form the
  * I-series was built for, extending the H8 curation funnel through
  * the round-8 output-shaping stages as ONE declarative plan:
  *
  *   curate (quality ∧ canonical ∧ not contaminated, H8)
  *     → semantic-dedup survivors (I4; docs WITHOUT an embedding pass
  *       — absence of a vector is not evidence of duplication)
  *     → source-mix resample over the SURVIVORS (H10 composable form:
  *       rates derive from the survivor mix, not the raw corpus)
  *     → training-shard packing (I1) of what remains.
  *
  * Like [[Curation.curate]], the self-contained form recomputes each
  * stage; [[pipelinePackFrom]] is the production shape over
  * materialized stage outputs — identical by construction, and
  * PipelineOpsSpec asserts the equality, so "the stages compose
  * without recomputation" is a tested property, not a doc claim.
  *
  * Embedding↔document identity: `vec_id` is the embedding of the
  * same-numbered `doc_id` (the fixture generates them 1:1 on a shared
  * id space; at sf0.1 only a prefix of docs carries vectors, which is
  * exactly the "absence passes" case above).
  */
object Pipeline {

  /** doc_ids the semantic stage DROPS (keep = false), live. */
  def semanticDrops(spark: SparkSession, dir: String): DataFrame =
    SemanticDedup.semanticDedup(spark, dir)
      .where(!col("keep"))
      .select(col("vec_id").as("doc_id"))

  /** Self-contained form (recomputes stages; the oracle twin nests
    * the stages' own SQL the same way). */
  def pipelinePack(spark: SparkSession, dir: String): DataFrame =
    pipelinePackFrom(
      Tables.documents(spark, dir),
      Curation.curate(spark, dir),
      semanticDrops(spark, dir))

  /** The funnel over MATERIALIZED stage outputs: curated docs minus
    * semantic drops, mix-resampled over the survivor set, packed into
    * fixed-token shards. No stage recomputes another's work — at
    * 100 TB each stage persists once and every downstream consumer
    * (this one included) reads the frame. */
  def pipelinePackFrom(documents: DataFrame, curated: DataFrame,
                       semanticDrops: DataFrame,
                       shardTokens: Long = 2000L): DataFrame = {
    val survivors = curated.select("doc_id", "source")
      .join(semanticDrops, Seq("doc_id"), "left_anti")
    val resampled = Sampling.mixResampleFrom(survivors).select("doc_id")
    Packing.shardPackFrom(
      documents.select("doc_id", "text")
        .join(resampled, Seq("doc_id"), "left_semi"),
      shardTokens)
  }

  /** The semantic stage's drop-set pinned for the driver's verify
    * fixture (sf0.01): k-means training is not SQL-expressible, so
    * the oracle twin consumes the stage's CHECKED-IN output — the
    * golden-keep-set device the H8 oracle precedent extends to the
    * trained stage. GoldenSpec re-runs the live operator at sf0.01
    * and asserts it still equals this resource, so the oracle can
    * never silently drift from the code. (The other stages' SQL is
    * dir-independent; this literal makes `pipelinePackSql` valid
    * exactly at the fixture the driver verifies on.) */
  private[graft] lazy val pinnedDropIds: Seq[Long] = {
    val in = getClass.getResourceAsStream("/graft/semantic_drop_sf0.01.csv")
    require(in != null, "missing resource graft/semantic_drop_sf0.01.csv")
    val src = Source.fromInputStream(in)
    try src.getLines().filter(_.nonEmpty).map(_.toLong).toVector
    finally src.close()
  }

  /** Oracle: the stages' own verified SQL composed as CTEs —
    * [[Curation.curateSql]] verbatim, the pinned semantic drop list,
    * then the mix-resample and shard-pack arithmetic re-stated over
    * the survivor CTE with the exact text of their standalone twins
    * ([[Sampling.mixResampleSql]], [[Packing.shardPackSql]]). */
  def pipelinePackSql(shardTokens: Long = 2000L): String = {
    val drops =
      if (pinnedDropIds.isEmpty) "TRUE"
      else s"doc_id NOT IN (${pinnedDropIds.mkString(", ")})"
    s"""WITH curated AS (${Curation.curateSql}),
      |surv AS (SELECT doc_id, source FROM curated WHERE $drops),
      |t AS (SELECT count(*) AS n_total, count(DISTINCT source) AS n_sources
      |      FROM surv),
      |thr AS (SELECT source,
      |    CAST(floor(least(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_s)
      |      * 65536) AS BIGINT) AS thr
      |  FROM (SELECT source, count(*) AS n_s FROM surv GROUP BY 1) p, t),
      |res AS (SELECT s.doc_id FROM surv s JOIN thr ON s.source = thr.source
      |        WHERE ${Sampling.hashBucketSql("s.doc_id", "mix")} < thr.thr),
      |packed AS (
      |  SELECT d.doc_id,
      |    coalesce(CAST(ceil(length(d.text) / 4.0) AS BIGINT), 0) AS est_tokens,
      |    md5(d.doc_id || ':shard') AS h
      |  FROM documents d JOIN res ON d.doc_id = res.doc_id),
      |offs AS (
      |  SELECT doc_id, est_tokens,
      |    CAST(sum(est_tokens) OVER (ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - est_tokens AS start_off
      |  FROM packed)
      |SELECT CAST(floor(start_off / $shardTokens.0) AS BIGINT) AS shard_id,
      |  count(*) AS n_docs,
      |  CAST(sum(est_tokens) AS BIGINT) AS shard_tokens,
      |  min(doc_id) AS first_doc
      |FROM offs
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
