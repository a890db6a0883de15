package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
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
}
