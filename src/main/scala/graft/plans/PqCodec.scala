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
