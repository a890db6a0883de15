package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd signed-random-projection sign sketch over an
  * embedding column: bit j of the result is set iff the dot product of
  * the vector with deterministic hyperplane `family·Bits + j` is
  * positive. Replaces a generated ~2000-term SQL projection (Bits ×
  * Dims multiply-adds spelled out as CASE WHEN chains) that fell out
  * of JIT-able codegen and cost ~1 ms/row interpreted — this is a
  * fused primitive loop over a precomputed sign matrix, called once
  * per row.
  *
  * Bit-identity with the SQL twin (still emitted for the DuckDB
  * oracle, see [[graft.operators.Dedup.embeddingNearDupSql]]): the dot
  * accumulates in ascending element order with each term
  * `(double) emb[i] * ±1.0` — multiplication by ±1.0 is exact and the
  * addition order matches the left-associative SQL `+` chain, so the
  * `> 0` decision is identical on both engines.
  */
case class SrpSketch(child: Expression, family: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if family >= 0 && family < SrpSketch.MaxFamilies =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_srp_sketch family must be in [0, ${SrpSketch.MaxFamilies}), got $family")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sketch expects array<float|double>, got $dt")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_srp_sketch"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat) SrpSketch.computeF(arr, family) else SrpSketch.computeD(arr, family)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "computeF" else "computeD"
    defineCodeGen(ctx, ev, c => s"graft.plans.SrpSketch$$.MODULE$$.$fn($c, $family)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSketch =
    copy(child = newChild)
}

object SrpSketch {
  /** Sketch width in bits; hyperplane h = family·Bits + bit. */
  val Bits = 16
  /** Number of independent hyperplane families (sketches). */
  val MaxFamilies = 2
  /** Embedding dimensionality the hyperplanes are defined over — must
    * match the SQL twin, which spells out exactly this many terms. */
  val Dims = 64

  /** Deterministic hyperplane sign: md5("h:i") first-nibble parity —
    * the single source of truth for both engines (the SQL twin embeds
    * these as literals). */
  def sign(h: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$h:$i".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xF) >= 8) 1.0 else -1.0
  }

  private val signs: Array[Array[Double]] =
    Array.tabulate(MaxFamilies * Bits, Dims)(sign)

  /** Short arrays fail fast: the SQL twin's out-of-range index yields
    * NULL (bit unset) where a partial native dot could set it — a
    * silent cross-engine divergence far from the bad row. Arrays
    * LONGER than Dims are fine: both engines read exactly the first
    * Dims elements. */
  private def checkDims(arr: ArrayData): Unit =
    if (arr.numElements() < Dims)
      throw new IllegalArgumentException(
        s"graft_srp_sketch needs >= $Dims elements, got ${arr.numElements()}")

  def computeF(arr: ArrayData, family: Int): Long = {
    checkDims(arr)
    var sk = 0L
    var j = 0
    while (j < Bits) {
      val row = signs(family * Bits + j)
      var dot = 0.0
      var i = 0
      while (i < Dims) { dot += arr.getFloat(i).toDouble * row(i); i += 1 }
      if (dot > 0) sk |= 1L << j
      j += 1
    }
    sk
  }

  def computeD(arr: ArrayData, family: Int): Long = {
    checkDims(arr)
    var sk = 0L
    var j = 0
    while (j < Bits) {
      val row = signs(family * Bits + j)
      var dot = 0.0
      var i = 0
      while (i < Dims) { dot += arr.getDouble(i) * row(i); i += 1 }
      if (dot > 0) sk |= 1L << j
      j += 1
    }
    sk
  }
}
