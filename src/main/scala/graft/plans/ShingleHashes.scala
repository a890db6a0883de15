package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd signature primitives over a shingle array — the
  * per-row replacements for the explode → md5 → 12-to-60-aggregate
  * shape the dedup pipelines used (graft.operators.Dedup): one fused
  * loop per document instead of ~|shingles| exploded rows through
  * partial aggregation, so the whole signature stage is narrow.
  *
  * Bit-identity with the SQL twins the DuckDB oracle evaluates:
  * digests are MD5 over the UTF-8 bytes of exactly the strings the
  * twins hash ("j:"||shingle / shingle / "2:"||shingle), the minhash
  * "min" is the unsigned byte-wise digest order (identical to the
  * lexicographic order of Spark/DuckDB's lowercase-hex md5() output),
  * and the simhash majority vote tests the same hex-nibble positions.
  */
object ShingleHashes {

  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def hexByte(b: Int): (Char, Char) = {
    val digits = "0123456789abcdef"
    (digits((b >> 4) & 0xF), digits(b & 0xF))
  }

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val (h, l) = hexByte(d(i) & 0xFF)
      out(2 * i) = h.toByte
      out(2 * i + 1) = l.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** true iff a < b in unsigned byte order — the same order as the
    * lexicographic comparison of their lowercase-hex renderings. */
  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Per-function digest prefixes "0:".."127:", precomputed — the
    * inner loop must not allocate per (shingle, j) pair. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(128)(j => s"$j:".getBytes("UTF-8"))
  private val prefix2: Array[Byte] = "2:".getBytes("UTF-8")

  /** H per-function minima of md5("j:"||shingle), as lowercase hex —
    * element j equals min(md5(concat('j:', x))) over the array. Null
    * elements are skipped, exactly as the aggregate min over
    * md5('j:'||NULL) = NULL rows ignored them. */
  def minhash(arr: ArrayData, h: Int): ArrayData = {
    require(h <= prefixes.length, s"graft_minhash H capped at ${prefixes.length}")
    val md = tl.get()
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](h)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < h) {
          md.reset()
          md.update(prefixes(j))
          md.update(x)
          val d = md.digest()
          if (mins(j) == null || ltUnsigned(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else toHex(m)))
  }

  /** 60-bit simhash: bit p-1 is the majority vote of hex-nibble-high
    * at position p of md5(x) (p ≤ 32) / md5("2:"||x) (p > 32). Null
    * elements count toward the vote denominator but contribute no
    * highs — exactly the aggregate shape's behavior (count(1) over
    * exploded rows kept nulls; the CASE over md5(NULL) added 0). */
  def simhash(arr: ArrayData): Long = {
    val md = tl.get()
    val n = arr.numElements()
    val hi = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getUTF8String(i).getBytes
        md.reset()
        md.update(x)
        val d1 = md.digest()
        md.reset()
        md.update(prefix2)
        md.update(x)
        val d2 = md.digest()
        var p = 0
        while (p < 60) {
          val (d, pos) = if (p < 32) (d1, p) else (d2, p - 32)
          val b = d(pos / 2) & 0xFF
          val nib = if (pos % 2 == 0) (b >> 4) & 0xF else b & 0xF
          if (nib >= 8) hi(p) += 1
          p += 1
        }
      }
      i += 1
    }
    var sk = 0L
    var p = 0
    while (p < 60) {
      if (2 * hi(p) > n) sk |= 1L << p
      p += 1
    }
    sk
  }
}

/** `graft_minhash(shingles, H)` → array<string> of the H per-function
  * minimum digests. */
case class MinhashSig(child: Expression, h: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // mirror the execution-time bound (ShingleHashes.minhash requires
    // h <= 128) so an oversized H fails at analysis, not in a task
    case ArrayType(StringType, _) if h >= 1 && h <= 128 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash H must be in [1, 128], got $h")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got $dt")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.minhash(input.asInstanceOf[ArrayData], h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ShingleHashes$$.MODULE$$.minhash($c, $h)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `graft_simhash(shingles)` → 60-bit majority-vote fingerprint. */
case class SimhashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $dt")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ShingleHashes$$.MODULE$$.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}
