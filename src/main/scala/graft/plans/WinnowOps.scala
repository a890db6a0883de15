package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[WinnowFp]] — the whole Y3 winnowing selection
  * (token K-grams → one md5 per gram → sliding-W window minima with
  * rightmost ties → consecutive dedup) fused into ONE pass,
  * replacing the interpreted HOF chain in `Winnowing.fpStructs`
  * (`transform(grams, md5)` + per-window `slice`/`array_min`/
  * `aggregate` lambdas all ran interpreted per element — the
  * dominant cost of the whole winnowing family, 60–100 s entries at
  * 100×).
  *
  * Bit-identity with the replaced chain (and the unchanged DuckDB
  * twin `Winnowing.fpSqlCtes`):
  *  - grams are [[GramOps.shingles]]' non-distinct K-grams (byte
  *    spans over the 0x20-split tokens, end-truncated,
  *    `max(T−K+1, 1)` of them; NULL text behaves as empty → one
  *    empty gram);
  *  - fp = lowercase-hex md5 of the gram bytes (Spark `md5()`);
  *    window minima compare the RAW 16-byte digests unsigned, which
  *    orders exactly like the hex strings (hex is an
  *    order-preserving byte map);
  *  - windows i ∈ 1..max(G−W+1, 1), each `slice(gh, i, W)`
  *    (shorter than W only when G < W — then the one window is all
  *    grams); the selected position is the RIGHTMOST index attaining
  *    the window minimum (the paper's robust-winnowing tie rule, the
  *    chain's keep-last integer fold);
  *  - consecutive selections repeating the same (pos, fp) collapse —
  *    equal pos implies equal fp (same gram index), so the dedup
  *    key is the position. */
object WinnowOps {

  private def cmpDigest(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private val HexChars = "0123456789abcdef".getBytes

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) & 0xF0) >> 4)
      out(2 * i + 1) = HexChars(d(i) & 0x0F)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def winnowFp(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = if (s == null) Array.empty[Byte] else s.getBytes
    val (starts, ends) = GramOps.tokenBounds(b)
    val t = starts.length
    val g = math.max(t - k + 1, 1)
    val md = GramOps.mdTl.get()
    val digs = new Array[Array[Byte]](g)
    var i = 0
    while (i < g) {
      val e = ends(math.min(i + k - 1, t - 1))
      md.reset()
      md.update(b, starts(i), e - starts(i))
      digs(i) = md.digest()
      i += 1
    }
    val nw = math.max(g - w + 1, 1)
    val out = new java.util.ArrayList[Any](2 * nw / (w + 1) + 4)
    var lastPos = -1
    var wi = 0
    while (wi < nw) {
      val end = math.min(wi + w, g)
      var best = wi
      var j = wi + 1
      while (j < end) {
        // <= keeps the LATER index on ties — the rightmost-minimum rule
        if (cmpDigest(digs(j), digs(best)) <= 0) best = j
        j += 1
      }
      if (best != lastPos) {
        out.add(new GenericInternalRow(
          Array[Any]((best + 1).toLong, hex(digs(best)))))
        lastPos = best
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_winnow_fp(text, k_lit, w_lit)` → array<struct<pos: bigint,
  * fp: string>> of the winnowing-selected (position, fingerprint)
  * pairs. */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fp k and w must be >= 1, got ($k, $w)")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fp expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_winnow_fp"
  // never-null (NULL text behaves as empty text), like Shingles
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    WinnowOps.winnowFp(child.eval(input).asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.WinnowOps$$.MODULE$$.winnowFp(
          ${c.isNull} ? null : ${c.value}, $k, $w);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}
