package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, via codegen'd
  * higher-order built-ins (`zip_with`/`aggregate`) — no UDFs, so the
  * whole expression stays inside Catalyst and is pushed into the scan
  * stage. Each helper has a DuckDB SQL twin.
  *
  * Elements are cast to DOUBLE before any arithmetic: DuckDB's
  * list_cosine_similarity on raw FLOAT[] computes in float32, which
  * diverges from Spark's double math at the 7th significant digit
  * (measured); with DOUBLE[] both engines agree to ~1e-12.
  */
object Vectors {

  /** Sequential-order double dot product of two float vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** DuckDB twin; relies on DOUBLE[] promotion for f64 math. */
  def cosineSql(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** Hot-path cosine: the native codegen'd Catalyst expression
    * ([[graft.plans.CosineSimilarity]]), bit-identical to [[cosine]]
    * (same per-sum accumulation order) but a fused primitive loop
    * instead of interpreted higher-order lambdas. Registers the
    * function in the session on first use (idempotent). */
  def cosineFast(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_cosine", a, b)
  }

  /** Native codegen'd SRP sign sketch ([[graft.plans.SrpSketch]]) for
    * hyperplane family `s` — bit-identical to the spelled-out SQL twin
    * (same accumulation order), but a fused loop over a precompiled
    * sign matrix instead of a ~2000-term generated projection. */
  def srpSketchFast(spark: org.apache.spark.sql.SparkSession, emb: Column, s: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_srp_sketch", emb, lit(s))
  }

  /** Native per-row minhash signature ([[graft.plans.MinhashSig]]):
    * element j = min(md5("j:"||x)) over the shingle array — the fused
    * replacement for explode + H min() aggregates. */
  def minhashFast(spark: org.apache.spark.sql.SparkSession, sh: Column, h: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_minhash", sh, lit(h))
  }

  /** Native per-row 60-bit simhash ([[graft.plans.SimhashSig]]) — the
    * fused replacement for explode + 60 conditional-count aggregates. */
  def simhashFast(spark: org.apache.spark.sql.SparkSession, sh: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_simhash", sh)
  }

  /** Native token n-grams ([[graft.plans.Shingles]]): the fused
    * replacement for split → transform(sequence, concat_ws(slice)) →
    * array_distinct — each gram is a zero-copy byte span of the
    * original text. */
  def shinglesFast(spark: org.apache.spark.sql.SparkSession, text: Column,
                   n: Int, distinct: Boolean): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_shingles", text, lit(n), lit(distinct))
  }

  /** Native [total, distinct] n-gram counts ([[graft.plans.GramStats]])
    * in one pass, no gram array materialized. */
  def gramStatsFast(spark: org.apache.spark.sql.SparkSession, text: Column,
                    n: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_gram_stats", text, lit(n))
  }

  /** Native sorted-set subtraction ([[graft.plans.SortedExcept]]):
    * elements of `items` absent from the ascending-sorted (UTF8 binary
    * order — `sort_array`) `sortedArr`, via binary-search probes in one
    * fused loop — O(|items|·log|set|) vs the O(|items|·|set|)
    * `filter(items, x -> !array_contains(set, x))` it replaces. */
  def sortedExceptFast(spark: org.apache.spark.sql.SparkSession,
                       items: Column, sortedArr: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_sorted_except", items, sortedArr)
  }

  /** Native sign-bit packing ([[graft.plans.BitPack]]): 32-bit sign
    * words of the embedding as array<bigint> — the binary-quantization
    * storage primitive; hamming scoring over the words is plain
    * xor+popcount built-ins. */
  def bitpackFast(spark: org.apache.spark.sql.SparkSession, emb: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_bitpack", emb)
  }

  /** Native PQ encode ([[graft.plans.PqEncode]]): argmin code per
    * subvector against the trained codebook, passed as a foldable
    * array literal and unpacked once at resolution. */
  def pqEncodeFast(spark: org.apache.spark.sql.SparkSession, emb: Column,
                   cb: IndexedSeq[Float], m: Int, k: Int, d: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_pq_encode", emb, lit(cb.toArray), lit(m), lit(k), lit(d))
  }
}
