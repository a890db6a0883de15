package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopK, Vectors}
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (D1-D2).
  *
  * Rank/argmax decisions order by round(cos, 9) with a vec_id/label
  * tiebreak so ~1e-15 double-summation-order differences between
  * engines can never flip a rank at a boundary.
  */
object SimilaritySearch {

  private val K = 5
  private val NQueries = 8
  private val NProbe = 2

  private def scoredAgainstQueries(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val q = broadcast(emb.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    emb.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Vectors.cosineFast(spark, col("q_emb"), col("embedding")).as("cos_sim"))
  }

  /** Expand a `hits` array of top-k (id, sim) structs into ranked rows. */
  private def explodeRanked(df: DataFrame): DataFrame =
    df.select(col("query_id"), posexplode(col("hits")).as(Seq("i", "h")))
      .select(col("query_id"), (col("i") + 1).cast("int").as("rank"),
        col("h.id").as("vec_id"), col("h.sim").as("cos_sim"))
      .orderBy("query_id", "rank")

  // ---------------------------------------------------------------- D1
  /** Brute-force exact cosine top-k via the bounded TopK Aggregator
    * ([[graft.functions.TopK]]): queries are broadcast, scoring is
    * map-side, and the PARTIAL aggregation already reduces every
    * partition to ≤k rows per query — only k·P rows cross the shuffle;
    * the scored table never does. */
  def bruteTopK(spark: SparkSession, dir: String): DataFrame =
    explodeRanked(
      scoredAgainstQueries(spark, dir)
        .groupBy("query_id")
        .agg(TopK.topk(spark, K, col("vec_id"), col("cos_sim")).as("hits")))

  val bruteTopKSql: String =
    s"""SELECT query_id, rank, vec_id, cos_sim FROM (
      |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
      |    ${Vectors.cosineSql("q.embedding", "e.embedding")} AS cos_sim,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY round(${Vectors.cosineSql("q.embedding", "e.embedding")}, 9) DESC,
      |               e.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      |  WHERE q.vec_id < $NQueries) t
      |WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- D2
  /** IVF-style ANN: coarse centroids (per-label means — a stand-in for
    * trained k-means, deterministic), every vector assigned to its
    * nearest centroid; a query probes only its NProbe nearest
    * centroids' buckets, touching ~NProbe/C of the corpus. Centroids
    * are tiny and broadcast; the per-dimension mean is a (label, pos)
    * partial aggregation — fully distributed, no collect. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = broadcast(emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("c_emb")))

    val centScore = emb.select("vec_id", "embedding").join(cents)
      .select(col("vec_id"), col("embedding"), col("label"),
        Vectors.cosineFast(spark, col("embedding"), col("c_emb")).as("c_cos"))
    val wVec = Window.partitionBy("vec_id")
      .orderBy(round(col("c_cos"), 9).desc, col("label"))
    val assign = centScore.withColumn("rk", row_number().over(wVec))
      .where(col("rk") === 1).select(col("vec_id"), col("embedding"), col("label"))

    val probes = centScore.where(col("vec_id") < NQueries)
      .withColumn("rk", row_number().over(wVec)).where(col("rk") <= NProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("label"))

    explodeRanked(
      probes.join(assign, Seq("label"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          Vectors.cosineFast(spark, col("q_emb"), col("embedding")).as("cos_sim"))
        .groupBy("query_id")
        .agg(TopK.topk(spark, K, col("vec_id"), col("cos_sim")).as("hits")))
  }

  val ivfTopKSql: String =
    s"""WITH dims AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS pos,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |cents AS (
      |  SELECT label, list(c ORDER BY pos) AS c_emb
      |  FROM (SELECT label, pos, avg(v) AS c FROM dims GROUP BY 1, 2) t
      |  GROUP BY 1),
      |cscore AS (
      |  SELECT e.vec_id, e.embedding, c.label,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c_emb), 9) DESC,
      |               c.label) AS rk
      |  FROM embeddings e, cents c),
      |assign AS (SELECT vec_id, embedding, label FROM cscore WHERE rk = 1),
      |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, label
      |           FROM cscore WHERE vec_id < $NQueries AND rk <= $NProbe)
      |SELECT query_id, rank, vec_id, cos_sim FROM (
      |  SELECT p.query_id, a.vec_id,
      |    ${Vectors.cosineSql("p.q_emb", "a.embedding")} AS cos_sim,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY round(${Vectors.cosineSql("p.q_emb", "a.embedding")}, 9) DESC,
      |               a.vec_id) AS rank
      |  FROM probes p JOIN assign a ON p.label = a.label AND a.vec_id <> p.query_id) t
      |WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin
}
