package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder (D5): argmin-encode each of `m`
  * subvectors against its `k`-centroid codebook — the n·m·k·d float
  * work runs in one precompiled static loop (the round-5 perf lesson:
  * a generated 1024-term expression chain falls out of JIT at
  * ~1 ms/row; a native expression calling a static method stays
  * compiled).
  *
  * The flat codebook rides the EXPRESSION (reference object in
  * codegen, serialized field otherwise), so executors get it with the
  * task — no registry, no static state, cluster-safe.
  */
object PqCodec {

  /** Codes per subvector: centroid (mi, j) lives at cb[((mi*k)+j)*d ..
    * +d). Sequential double L2 accumulation; ties take the smallest
    * code — deterministic. Vectors shorter than m·d read as
    * zero-padded. */
  def encode(emb: ArrayData, cb: Array[Float], m: Int, k: Int, d: Int): ArrayData = {
    val n = emb.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (mi * k + j) * d
        val off = mi * d
        var dist = 0.0
        var i = 0
        while (i < d) {
          val x = if (off + i < n && !emb.isNullAt(off + i))
            emb.getFloat(off + i).toDouble else 0.0
          val diff = x - cb(base + i).toDouble
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Σ over subvectors of lut[off + mi·k + code[mi]] — the fused ADC
    * lookup sum (dot, norm and residual-cross terms all have this
    * shape). Left-associated ascending-mi accumulation, bit-identical
    * to the element_at chain it replaces and to the oracle's explicit
    * `lut[i1] + lut[i2] + …` sum. */
  def lutSum(code: ArrayData, off: Int, lut: Array[Double], k: Int): Double = {
    val m = code.numElements()
    if (m == 0) return 0.0
    var s = lut(off + code.getInt(0))
    var mi = 1
    while (mi < m) { s += lut(off + mi * k + code.getInt(mi)); mi += 1 }
    s
  }
}

/** `graft_lut_sum(code, off, lut_lit, k_lit)` → double: the ADC
  * m-lookup sum over a FLATTENED multi-LUT literal, `off` selecting
  * the query/centroid slice. The LUT rides the expression as a
  * reference object (FrozenSeq — O(1) plan hashing; a plain
  * element_at chain over an 80k-double array literal cost multi-
  * second driver gaps in canonicalization/AQE replanning), the loop
  * is one precompiled static call — no boxed per-element access. */
case class LutSum(code: Expression, off: Expression,
                  lut: IndexedSeq[Double], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = code
  override def right: Expression = off
  override def checkInputDataTypes(): TypeCheckResult =
    (code.dataType, off.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, o) => TypeCheckResult.TypeCheckFailure(
        s"graft_lut_sum expects (array<int>, int), got ($c, $o)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_lut_sum"
  @transient private lazy val lutArr: Array[Double] = lut.toArray
  override protected def nullSafeEval(c: Any, o: Any): Any =
    PqCodec.lutSum(c.asInstanceOf[ArrayData], o.asInstanceOf[Int], lutArr, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("adcLut", lutArr, "double[]")
    defineCodeGen(ctx, ev, (c, o) =>
      s"graft.plans.PqCodec$$.MODULE$$.lutSum($c, $o, $lutRef, $k)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LutSum =
    copy(code = newLeft, off = newRight)
}

/** `graft_pq_encode(embedding, codebook_lit, m, k, d)` → array<int>
  * of m codes. The codebook/m/k/d arrive as FOLDABLE literals and are
  * extracted once at function-resolution time (GraftFunctions), never
  * per row. */
case class PqEncode(child: Expression, cb: IndexedSeq[Float],
                    m: Int, k: Int, d: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if cb.length == m * k * d =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode codebook has ${cb.length} floats, expected ${m * k * d}")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float>, got $dt")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  @transient private lazy val cbArr: Array[Float] = cb.toArray
  override protected def nullSafeEval(input: Any): Any =
    PqCodec.encode(input.asInstanceOf[ArrayData], cbArr, m, k, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqCodec$$.MODULE$$.encode($c, $cbRef, $m, $k, $d)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
