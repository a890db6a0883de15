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

  /** Flat piece-id stream of `s` under the frozen model (P1's EXPORT
    * pass — the integer artifact a training shard stores): per word,
    * binary-search the closed vocab and emit its precomputed piece-id
    * run (`ids[offsets(i) until offsets(i+1)]`); an OOV word falls
    * back to per-character ids — the char's index in the sorted piece
    * vocabulary when present, else `|pieces| + codepoint` (a
    * deterministic catch-all outside the learned id space). Same fused
    * zero-copy 0x20 tokenization as [[count]]; NULL text is empty. */
  def encode(s: UTF8String, words: Array[UTF8String], offsets: Array[Long],
             ids: Array[Long], pieces: Array[UTF8String]): ArrayData = {
    val b = if (s == null) Array.empty[Byte] else s.getBytes
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        val w = UTF8String.fromBytes(b, start, i - start)
        val idx = find(words, w)
        if (idx >= 0) {
          var k = offsets(idx).toInt
          val end = offsets(idx + 1).toInt
          while (k < end) { out += ids(k); k += 1 }
        } else {
          val str = w.toString
          var k = 0
          while (k < str.length) {
            val cp = str.codePointAt(k)
            val ch = UTF8String.fromString(
              new String(Character.toChars(cp)))
            val pidx = find(pieces, ch)
            out += (if (pidx >= 0) pidx.toLong else pieces.length.toLong + cp)
            k += Character.charCount(cp)
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
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

/** `graft_bpe_encode(text, words_lit, offsets_lit, ids_lit, pieces_lit)`
  * → array<bigint>: the flat BPE piece-id stream of `text` under a
  * frozen model. `words` (ascending UTF8 binary order) index into the
  * flat `ids` run table via `offsets` (length |words|+1); `pieces`
  * (ascending) resolve OOV char fallback. All model state arrives as
  * foldable literals, extracted once at resolution. */
case class BpeEncode(child: Expression, words: IndexedSeq[String],
                     offsets: IndexedSeq[Long], ids: IndexedSeq[Long],
                     pieces: IndexedSeq[String]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if offsets.length == words.length + 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode needs ${words.length + 1} offsets, got ${offsets.length}")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"
  override def nullable: Boolean = false
  @transient private lazy val wordsArr: Array[UTF8String] = {
    val a = words.map(UTF8String.fromString).toArray
    var i = 1
    while (i < a.length) {
      require(a(i - 1).compareTo(a(i)) < 0,
        s"graft_bpe_encode vocab not strictly ascending at $i")
      i += 1
    }
    a
  }
  @transient private lazy val piecesArr: Array[UTF8String] = {
    val a = pieces.map(UTF8String.fromString).toArray
    var i = 1
    while (i < a.length) {
      require(a(i - 1).compareTo(a(i)) < 0,
        s"graft_bpe_encode pieces not strictly ascending at $i")
      i += 1
    }
    a
  }
  @transient private lazy val offsetsArr: Array[Long] = offsets.toArray
  @transient private lazy val idsArr: Array[Long] = ids.toArray
  override def eval(input: InternalRow): Any =
    BpeOps.encode(child.eval(input).asInstanceOf[UTF8String], wordsArr,
      offsetsArr, idsArr, piecesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bpeEncWords", wordsArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val oRef = ctx.addReferenceObj("bpeEncOffsets", offsetsArr, "long[]")
    val iRef = ctx.addReferenceObj("bpeEncIds", idsArr, "long[]")
    val pRef = ctx.addReferenceObj("bpeEncPieces", piecesArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.BpeOps$$.MODULE$$.encode(
          ${c.isNull} ? null : ${c.value}, $wRef, $oRef, $iRef, $pRef);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
