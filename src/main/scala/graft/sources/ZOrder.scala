package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K4: Z-order (Morton) clustering — the multi-column layout that
  * makes J7's file skipping work on MORE THAN ONE column at once: a
  * range layout on `ts` prunes ts queries perfectly and user queries
  * not at all; interleaving the bits of both (bucketed) columns into
  * one sort key gives every file a bounded rectangle of (ts, user)
  * space, so a range predicate on EITHER column intersects only the
  * files whose rectangle crosses it (~√F of F files for a narrow
  * slice, vs all F under the wrong single-column layout). The
  * Delta/Iceberg `ZORDER BY` idiom on plain parquet.
  *
  * Pipeline: bucket each column to `bits`-bit rank space from its
  * (min, max) — a bounded two-value aggregate, the layout job's only
  * pre-pass — interleave bits into the Morton key, then
  * `repartitionByRange` on the key and write; J7's manifest over the
  * written files supplies the per-file (min, max) for BOTH columns at
  * query time. Everything is codegen'd built-in bit arithmetic
  * (shift/and/or folds); no UDF, no shuffle beyond the one
  * range-partition the layout exists to create.
  *
  * Correctness is never at stake: like J7, skipping over-approximates
  * candidate files and the row predicate is re-applied in full —
  * a bad bucketing can only cost files read.
  */
object ZOrder {

  /** Morton-interleave two `bits`-wide non-negative bucketed coords:
    * bit i of `a` lands at 2i+1, bit i of `b` at 2i. */
  def interleave(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Scale `v` from [lo, hi] to the `bits`-bit bucket space. */
  def bucketed(v: Column, lo: Long, hi: Long, bits: Int = 16): Column = {
    val span = math.max(hi - lo, 1L)
    least(((v - lo).cast("double") / span * ((1L << bits) - 1)).cast("long"),
      lit((1L << bits) - 1L))
  }

  /** Write `df` into `nFiles` files Z-ordered on (c1, c2). The (min,
    * max) pre-pass is one bounded aggregate; rows with NULL in either
    * column sort first (z=-1) and land together, where any range
    * manifest correctly never selects them. Both columns are read
    * through a long cast, so any long-castable ordered type works
    * (int/short/long/timestamp — timestamps bucket at second
    * granularity; dates: cast to timestamp first). The cast is
    * monotone on these types, so the Morton layout it produces is the
    * same one the column's own order defines. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String,
                    nFiles: Int, outPath: String, bits: Int = 16): Unit = {
    val l1 = col(c1).cast("long")
    val l2 = col(c2).cast("long")
    val r = df.agg(min(l1), max(l1), min(l2), max(l2)).collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"z-order needs non-null ($c1, $c2) bounds — empty or all-null input")
    val z = when(col(c1).isNull || col(c2).isNull, lit(-1L)).otherwise(
      interleave(
        bucketed(l1, r.getLong(0), r.getLong(1), bits),
        bucketed(l2, r.getLong(2), r.getLong(3), bits), bits))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }
}
