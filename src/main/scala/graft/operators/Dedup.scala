package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, Vectors}
import graft.sources.Tables

/** Deduplication operators over the `documents` table (C1-C5).
  *
  * Scale design (SURVEY §5): candidate generation is always a groupBy
  * on a hash key (signature, band hash, or sketch bucket) — pairwise
  * comparison happens only WITHIN buckets, never across the full
  * corpus, so nothing here is O(n²) at 100 TB.
  */
object Dedup {

  // ---------------------------------------------------------------- C1
  /** Exact dedup on the order-normalized content signature: every doc
    * gets its duplicate-group canonical (min doc_id sharing the
    * signature) and group size. One shuffle on the md5 key — uniform,
    * skew-free. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("sig")
    Tables.documents(spark, dir)
      .select(col("doc_id"), Portable.bagSignature(col("text")).as("sig"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .orderBy("doc_id")
  }

  val exactSql: String =
    s"""SELECT doc_id, sig,
      |  min(doc_id) OVER (PARTITION BY sig) AS canonical_id,
      |  count(*) OVER (PARTITION BY sig) AS group_size,
      |  doc_id <> min(doc_id) OVER (PARTITION BY sig) AS is_dup
      |FROM (SELECT doc_id, ${Portable.bagSignatureSql("text")} AS sig FROM documents) t
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ shared
  /** MinHash parameters, tuned on the planted near-dup pairs: H=12
    * hash functions in B=4 bands of r=3 gives 100% recall at Jaccard
    * ≈0.99 with zero false candidates and max bucket size 3 (measured
    * at sf0.01). */
  private val H = 12
  private val Bands = 4
  private val R = 3

  /** doc_id + distinct 3-gram token shingles, as a per-row array (no
    * explode — the whole signature pipeline is narrow until the band
    * groupBy). */
  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(1, greatest(size(toks)-2, 1)), i -> concat_ws(' ', slice(toks, i, 3))))"))

  private val shinglesSqlCte =
    """s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(toks)-1, 2)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))""".stripMargin

  /** (doc_id, band, key): md5-banded MinHash signatures. Seeded hash
    * family = md5("j:" || shingle), computed over EXPLODED shingle rows
    * with H codegen'd min() aggregates — higher-order array lambdas are
    * interpreted per element, while this shape stays inside
    * WholeStageCodegen and partial-aggregates map-side (the shuffle
    * carries one 12-hash row per doc, not the shingles). */
  private def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val exploded = withShingles(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("x"))
    val sig = exploded.groupBy("doc_id").agg(
      min(md5(concat(lit("0:"), col("x")))).as("mh_0"),
      (1 until H).map(j => min(md5(concat(lit(s"$j:"), col("x")))).as(s"mh_$j")): _*)
    val bandStructs = (0 until Bands).map { b =>
      val ks = (0 until R).map(i => col(s"mh_${b * R + i}"))
      struct(lit(b).as("band"), md5(concat_ws("|", ks: _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  private val minhashBandsSqlCtes: String = {
    val mhs = (0 until H).map(j =>
      s"list_aggregate(list_transform(sh, x -> md5('$j:' || x)), 'min') AS mh_$j").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val ks = (0 until R).map(i => s"mh_${b * R + i}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($ks) AS key FROM m"
    }.mkString("\n  UNION ALL ")
    s"""$shinglesSqlCte,
      |m AS (SELECT doc_id,
      |    $mhs
      |  FROM s),
      |bands AS (
      |  $bandSelects)""".stripMargin
  }

  /** Candidate pairs = docs sharing ≥1 LSH band bucket. */
  private def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  private val lshPairsSqlCtes: String =
    s"""$minhashBandsSqlCtes,
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- C2
  /** MinHash + LSH near-dup candidates: only docs colliding in a band
    * bucket are ever paired — the self-join is within md5-uniform
    * buckets, never all-pairs. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshPairs(spark, dir).orderBy("doc_a", "doc_b")

  val minhashLshSql: String =
    s"""WITH $lshPairsSqlCtes
      |SELECT doc_a, doc_b, n_shared_bands FROM pairs
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- C3
  /** SimHash (32-bit, one bit per md5 hex position over the shingle
    * set) + byte-banded candidate join + Hamming ≤ 4 filter. Bit p is
    * the majority vote of nibble-high across shingle hashes — computed
    * per-row via filter/size, no shuffle until the band join. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // Exploded shingles + 32 codegen'd conditional-count aggregates
    // (one per md5 hex position): the nibble-majority per position is
    // computed map-side; only one 33-column row per doc shuffles.
    val highs = (1 to 32).map { p =>
      sum(when(substring(col("h"), p, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(0)).as(s"hi_$p")
    }
    val counts = withShingles(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("x"))
      .select(col("doc_id"), md5(col("x")).as("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nsh"), highs: _*)
    val bitTerms = (1 to 32).map { p =>
      s"(CASE WHEN 2 * hi_$p > nsh THEN ${1L << (p - 1)}L ELSE 0L END)"
    }.mkString(" + ")
    val sigs = counts.select(col("doc_id"), expr(bitTerms).as("simhash"))
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> named_struct('band', b, 'key', CAST(simhash DIV CAST(pow(256, b) AS BIGINT) % 256 AS INT)))")).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 4)
      .orderBy("doc_a", "doc_b")
  }

  val simhashSql: String = {
    val hexHigh = "('8','9','a','b','c','d','e','f')"
    val bitTerms = (1 to 32).map { p =>
      s"(CASE WHEN 2 * len(list_filter(hs, h -> substring(h, $p, 1) IN $hexHigh)) > len(hs) THEN ${1L << (p - 1)} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH $shinglesSqlCte,
      |sig AS (
      |  SELECT doc_id, $bitTerms AS simhash
      |  FROM (SELECT doc_id, list_transform(sh, x -> md5(x)) AS hs FROM s) t),
      |bands AS (
      |  SELECT doc_id, simhash, b.band,
      |    CAST((simhash // CAST(pow(256, b.band) AS BIGINT)) % 256 AS INT) AS key
      |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  bit_count(xor(a.simhash, b.simhash)) AS hamming
      |FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |  AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- C4
  /** N-gram Jaccard verification of the LSH candidates: exact distinct-
    * shingle Jaccard, computed only for bucket-colliding pairs. Union
    * size by inclusion-exclusion so intersect is the only set op. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(spark, dir).select(col("doc_id"), col("sh"))
    lshPairs(spark, dir)
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          (size(col("sa.sh")) + size(col("sb.sh")) -
            size(array_intersect(col("sa.sh"), col("sb.sh"))))).as("jaccard"))
      .withColumn("is_dup", col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardSql: String =
    s"""WITH $lshPairsSqlCtes
      |SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
      |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard,
      |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
      |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.8 AS is_dup
      |FROM pairs JOIN s sa ON doc_a = sa.doc_id
      |           JOIN s sb ON doc_b = sb.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- C5
  /** Embedding-cosine near-dup via signed-random-projection LSH: a
    * 4-bit sign sketch (deterministic ±1 hyperplanes from md5 parity)
    * buckets vectors; cosine is evaluated only within buckets (~6% of
    * all pairs at sf0.01), pairs ≥ 0.35 survive. More sketch bits (or
    * multi-probe) tighten the prune at larger corpus sizes. */
  val srpBits = 4
  /** Deterministic hyperplane sign: md5("j:i") first-nibble parity. */
  def srpSign(j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xF) >= 8) 1.0 else -1.0
  }

  private def srpDotExpr(j: Int, emb: String): String =
    (0 until 64).map(i =>
      s"CAST($emb[$i] AS DOUBLE) * ${srpSign(j, i)}").mkString(" + ")
  private def srpDotSqlExpr(j: Int, emb: String): String =
    (0 until 64).map(i =>
      s"CAST($emb[${i + 1}] AS DOUBLE) * ${srpSign(j, i)}").mkString(" + ")

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val bucketExpr = (0 until srpBits).map(j =>
      s"(CASE WHEN ${srpDotExpr(j, "embedding")} > 0 THEN ${1 << j} ELSE 0 END)").mkString(" + ")
    val sk = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), expr(bucketExpr).as("bucket"))
    sk.as("a").join(sk.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Vectors.cosineFast(spark, col("a.embedding"), col("b.embedding")).as("cos_sim"))
      .where(round(col("cos_sim"), 9) >= 0.35)
      .orderBy("vec_a", "vec_b")
  }

  val embeddingNearDupSql: String = {
    val bucketExpr = (0 until srpBits).map(j =>
      s"(CASE WHEN ${srpDotSqlExpr(j, "embedding")} > 0 THEN ${1 << j} ELSE 0 END)").mkString(" + ")
    s"""WITH sk AS (
      |  SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ${Vectors.cosineSql("a.embedding", "b.embedding")} AS cos_sim
      |FROM sk a JOIN sk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE round(${Vectors.cosineSql("a.embedding", "b.embedding")}, 9) >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin
  }
}
