package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle fact tables ONCE at write
  * time so every subsequent equi-join/aggregation on the bucket key
  * runs shuffle-free — the biggest repeated-query win at 100 TB, where
  * a fact-fact shuffle is the dominant cost.
  *
  * Spark buckets via the catalog (`bucketBy` requires `saveAsTable`);
  * with both sides bucketed and sorted on the join key and equal
  * bucket counts, the join plans as a zero-Exchange SortMergeJoin
  * (asserted in `BucketingSpec`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting; also
    * clears an orphaned location left by a crashed writer, which
    * otherwise fails CREATE with LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket two tables on their join keys with matching bucket counts
    * and return them; joins on (leftKey = rightKey) are then
    * co-located. */
  def coLocate(spark: SparkSession,
               left: DataFrame, leftTable: String, leftKey: String,
               right: DataFrame, rightTable: String, rightKey: String,
               buckets: Int): (DataFrame, DataFrame) = {
    writeBucketed(left, leftTable, leftKey, buckets)
    writeBucketed(right, rightTable, rightKey, buckets)
    (spark.table(leftTable), spark.table(rightTable))
  }
}
