package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-level bucketed prefix-sum machinery behind the
  * token-ordered operators ([[Sampling.tokenBudget]] H11,
  * [[Packing.shardPack]] I1). One implementation so the hash salt
  * format, the bucket width, and the NULL-token contract cannot
  * silently desynchronize between them — both operators' outputs are
  * proved equal to the single-global-window form precisely because
  * they share these invariants.
  *
  * Invariant: `bkt` is the FIRST TWO HEX DIGITS of the md5 sort key
  * `h`, i.e. a prefix of it — so bucket order refines (h, doc_id)
  * order, and (intra-bucket running sum) + (sum of earlier whole
  * buckets) reconstructs the exact global running sum. 256 buckets
  * bound each intra-bucket window task at ~n/256 rows; widen the
  * prefix at larger scale (the plan shape is unchanged).
  */
private[graft] object PrefixSum {

  /** doc_id (+ `extraCols`) + `est_tokens` + sort key `h` + bucket
    * `bkt`. NULL text estimates 0 tokens in BOTH engines — without
    * the coalesce, NULL est_tokens rows diverge from the DuckDB
    * twins (windowed SUM over an all-NULL frame is NULL there; and a
    * NULL-derived sort column orders first in Spark, last in DuckDB).
    * `tokenCounter` swaps the default chars/4 heuristic for a learned
    * counter (the P1 BPE column) — the ONE place the token unit is
    * defined, so every prefix-sum consumer inherits the swap. */
  def hashedBase(docs: DataFrame, salt: String,
                 extraCols: Seq[String] = Nil,
                 tokenCounter: Option[org.apache.spark.sql.Column] = None)
      : DataFrame =
    docs.select(Seq(col("doc_id")) ++ extraCols.map(col) ++ Seq(
      coalesce(tokenCounter
          .getOrElse(ceil(length(col("text")) / lit(4.0)).cast("long")), lit(0L))
        .as("est_tokens"),
      md5(concat(col("doc_id").cast("string"), lit(":" + salt))).as("h")): _*)
      .withColumn("bkt", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))

  /** Exclusive bucket offsets — the token total of all EARLIER
    * buckets within each `partCols` group — broadcast-joined back
    * onto `base`. The offsets window runs over ≤ groups × 256 rows (a
    * bounded frame), and `pruneOffsets` filters it BEFORE the join so
    * a consumer like tokenBudget can drop whole past-budget buckets
    * while the frame is still tiny. */
  def withBucketOffsets(base: DataFrame, partCols: Seq[String],
                        pruneOffsets: DataFrame => DataFrame = identity)
      : DataFrame = {
    val part = if (partCols.isEmpty) Seq(lit(0)) else partCols.map(col)
    val wOff = Window.partitionBy(part: _*).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pruneOffsets(
      base.groupBy((partCols :+ "bkt").map(col): _*)
        .agg(sum("est_tokens").as("bkt_tokens"))
        .withColumn("offset", coalesce(sum("bkt_tokens").over(wOff), lit(0L)))
        .select((partCols :+ "bkt").map(col) :+ col("offset"): _*))
    base.join(broadcast(offsets), partCols :+ "bkt")
  }
}
