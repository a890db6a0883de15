package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Corpus sampling/profiling operators (G1-G2) — the subsetting and
  * data-profiling steps of a training-data pipeline.
  *
  * Sampling is HASH-deterministic (md5 of key+salt), not RNG-based:
  * the same doc is always in or out regardless of partitioning,
  * executor count, or engine — reproducible experiment subsets and an
  * exact DuckDB oracle. Selection is a narrow per-row predicate; no
  * shuffle at any scale.
  */
object Sampling {

  /** G1: ~`pct`% per language (stratified): keep docs whose salted
    * md5's first 4 hex digits fall under pct% of 16^4. Being
    * value-hash based, the sample is stable under repartitioning and
    * identical on any engine with md5. */
  def hashSample(spark: SparkSession, dir: String, pct: Int = 10,
                 salt: String = "graft"): DataFrame = {
    val threshold = 65536 * pct / 100
    Tables.documents(spark, dir)
      .withColumn("bucket",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 4), 16, 10)
          .cast("long"))
      .where(col("bucket") < threshold)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy("doc_id")
  }

  def hashSampleSql(pct: Int = 10, salt: String = "graft"): String = {
    val threshold = 65536 * pct / 100
    // DuckDB has no base-conv; 4 nibbles via strpos arithmetic
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
    s"""SELECT doc_id, lang, source, bucket FROM (
      |  SELECT doc_id, lang, source,
      |    CAST(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)} AS BIGINT) AS bucket
      |  FROM (SELECT *, md5(doc_id || ':$salt') AS h FROM documents) t) s
      |WHERE bucket < $threshold
      |ORDER BY doc_id""".stripMargin
  }

  /** G2: per-source corpus profile — the triage table a pipeline
    * operator reads before deciding what to keep. One shuffle on the
    * low-cardinality source key, all aggregates algebraic. */
  def sourceProfile(spark: SparkSession, dir: String): DataFrame = {
    val D = DecimalType(18, 2)
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars").cast(D)).cast("double").as("total_chars"))
      .orderBy("source")
  }

  val sourceProfileSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT lang) AS n_langs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS total_chars
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
