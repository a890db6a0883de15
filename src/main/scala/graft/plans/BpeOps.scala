package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token counting (P1's scoring pass): whitespace-tokenize
  * the text and price each word against a frozen closed vocabulary —
  * the precomputed BPE token count if the word is in vocab, its
  * character count otherwise (the byte/char-fallback convention real
  * closed-vocab tokenizers use for OOV). One fused loop per row: byte
  * tokenization on 0x20 (zero-copy spans, the GramOps device) and a
  * binary search per word over the sorted vocab — no explode, no
  * join, no shuffle; the whole corpus scoring is a narrow projection.
  */
object BpeOps {

  /** Binary search `key` in the ascending (UTF8 binary order) vocab;
    * -1 when absent. */
  private def find(words: Array[UTF8String], key: UTF8String): Int = {
    var lo = 0
    var hi = words.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = words(mid).compareTo(key)
      if (c == 0) return mid
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** `[n_words, n_bpe_tokens]` of `s` under the frozen vocab. NULL
    * text behaves as empty text (one empty token), the house gram
    * convention. */
  def count(s: UTF8String, words: Array[UTF8String], counts: Array[Long]): ArrayData = {
    val b = if (s == null) Array.empty[Byte] else s.getBytes
    var nWords = 0L
    var nTok = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        val w = UTF8String.fromBytes(b, start, i - start)
        nWords += 1
        val idx = find(words, w)
        nTok += (if (idx >= 0) counts(idx) else w.numChars().toLong)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array[Any](nWords, nTok))
  }
}

/** `graft_bpe_count(text, words_lit, counts_lit)` → array<bigint>
  * `[n_words, n_bpe_tokens]`. The vocab arrives as foldable literals
  * (words MUST be ascending in UTF8 binary order, counts aligned) and
  * is extracted once at function resolution, never per row. */
case class BpeCount(child: Expression, words: IndexedSeq[String],
                    counts: IndexedSeq[Long]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if words.length == counts.length =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count vocab has ${words.length} words but ${counts.length} counts")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bpe_count"
  override def nullable: Boolean = false
  @transient private lazy val wordsArr: Array[UTF8String] = {
    val a = words.map(UTF8String.fromString).toArray
    var i = 1
    while (i < a.length) {
      require(a(i - 1).compareTo(a(i)) < 0,
        s"graft_bpe_count vocab not strictly ascending at $i: ${words(i - 1)} >= ${words(i)}")
      i += 1
    }
    a
  }
  @transient private lazy val countsArr: Array[Long] = counts.toArray
  override def eval(input: InternalRow): Any =
    BpeOps.count(child.eval(input).asInstanceOf[UTF8String], wordsArr, countsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bpeWords", wordsArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val cRef = ctx.addReferenceObj("bpeCounts", countsArr, "long[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.BpeOps$$.MODULE$$.count(
          ${c.isNull} ? null : ${c.value}, $wRef, $cRef);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
