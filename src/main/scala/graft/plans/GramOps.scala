package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram-over-tokens primitives — fused replacements for the
  * interpreted `split → transform(sequence, i -> concat_ws(slice))`
  * HOF chain that dominated every shingle-building pipeline (the
  * per-element lambda runs interpreted; at 10×sf0.1 the gram build was
  * the suite's closest-to-linear cost, BASELINE.md "Full-suite
  * scaling").
  *
  * Bit-identity with the replaced expressions (and so with the DuckDB
  * oracle twins, which are unchanged):
  *  - tokens are `split(text, ' ')` — every 0x20 byte is a separator
  *    (0x20 never occurs inside a UTF-8 multi-byte sequence), empty
  *    tokens between/after consecutive spaces kept, `"" → [""]`;
  *  - gram i = `concat_ws(' ', slice(toks, i, n))` for i in
  *    1..greatest(T-n+1, 1), end-truncated — since the joined tokens
  *    are consecutive and the separator is the single space that was
  *    split on, each gram is exactly the BYTE SPAN of the original
  *    text from token i's start to the window's last token's end (no
  *    string is ever rebuilt);
  *  - distinct keeps first-occurrence order, like `array_distinct`.
  *
  * Degenerate-text convention: NULL and `""` both yield the single
  * empty gram `[""]` — the chain's own behavior, kept deliberately so
  * every document has ≥1 gram and every derived signature
  * (minhash/simhash/jaccard) is total. The DuckDB twins instead drop
  * such docs from gram pipelines (`string_split('', ' ')` is `[]`
  * there); oracle comparisons therefore assume non-degenerate text,
  * which the generated corpora guarantee and a production pipeline's
  * quality gate (E2) enforces before any gram operator runs.
  */
object GramOps {

  /** Token start/end byte offsets of `b` split on 0x20 (Spark
    * `split(text, ' ')` token spans; T = spaces + 1 ≥ 1). */
  private[plans] def tokenBounds(b: Array[Byte]): (Array[Int], Array[Int]) = {
    var spaces = 0
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val starts = new Array[Int](spaces + 1)
    val ends = new Array[Int](spaces + 1)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < b.length) {
      if (b(i) == 0x20) { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = b.length
    (starts, ends)
  }

  /** Character n-grams as zero-copy spans over the shared byte
    * buffer, code-point boundaries identical to Spark `substring`.
    * Texts shorter than n yield an empty array (callers guard). */
  def charGrams(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    // code-point start offsets
    val L = s.numChars()
    if (L < n) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](L + 1)
    var i = 0
    var cp = 0
    while (i < b.length) {
      off(cp) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      cp += 1
    }
    off(L) = b.length
    val w = L - n + 1
    val out = new Array[Any](w)
    var g = 0
    while (g < w) {
      out(g) = UTF8String.fromBytes(b, off(g), off(g + n) - off(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  /** The n-gram string array (optionally first-occurrence-distinct):
    * each element is a zero-copy span view over one shared byte
    * buffer. NULL text behaves as EMPTY text (→ `[""]`), matching the
    * replaced `split → transform → array_distinct` chain bit-for-bit:
    * there `concat_ws(' ', slice(NULL, 1, n))` swallows the null
    * slice into one empty-string gram (verified against Spark 4.1.2)
    * — NOT null-propagation, NOT an empty array. */
  def shingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val b = if (s == null) Array.empty[Byte] else s.getBytes
    val (starts, ends) = tokenBounds(b)
    val t = starts.length
    val w = math.max(t - n + 1, 1)
    if (!distinct) {
      val out = new Array[Any](w)
      var i = 0
      while (i < w) {
        val e = ends(math.min(i + n - 1, t - 1))
        out(i) = UTF8String.fromBytes(b, starts(i), e - starts(i))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < w) {
        val e = ends(math.min(i + n - 1, t - 1))
        seen.add(UTF8String.fromBytes(b, starts(i), e - starts(i)))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }

  /** `[total, distinct]` n-gram counts in one pass — the repetition
    * signal's input, with no gram array ever materialized. NULL text
    * behaves as empty text (→ `[1, 1]`, the one empty gram), like
    * [[shingles]]. */
  def gramStats(s: UTF8String, n: Int): ArrayData = {
    val b = if (s == null) Array.empty[Byte] else s.getBytes
    val (starts, ends) = tokenBounds(b)
    val t = starts.length
    val w = math.max(t - n + 1, 1)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < w) {
      val e = ends(math.min(i + n - 1, t - 1))
      seen.add(UTF8String.fromBytes(b, starts(i), e - starts(i)))
      i += 1
    }
    new GenericArrayData(Array[Any](w.toLong, seen.size.toLong))
  }

  private[plans] val mdTl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SpacePad = UTF8String.fromString(" ")

  /** Mixed 1/2/3-CHARACTER-gram salted hash buckets of `text` — the
    * fused replacement for Y1 langid's three interpreted
    * `transform(sequence, i -> hashBucket(substring(p, i, w)))`
    * passes (measured 800 s at 100×: the HOF chain re-ran one md5
    * per gram through interpreted eval, five times once projection
    * collapse substituted it into every per-class score).
    *
    * Bit-identity with the replaced chain (and the unchanged DuckDB
    * twin): p = ' ' || lower(text) || ' ' (Spark `lower` ==
    * UTF8String.toLowerCase); for width w the gram count is
    * max(chars(p) − (w−1), 1) and gram i is the w-CODE-POINT
    * substring (tail-truncated — `substring` semantics in both
    * engines); bucket = first 4 hex digits of md5(gram || saltSuffix)
    * (== the digest's top two bytes) mod `dim`; emission order is all
    * 1-grams, then 2-grams, then 3-grams, each in text order. NULL
    * text behaves as empty text (callers coalesce anyway — stated so
    * the kernel is total). */
  def gramBuckets(s: UTF8String, saltSuffix: Array[Byte], dim: Int): ArrayData = {
    val base = if (s == null) UTF8String.EMPTY_UTF8 else s.toLowerCase
    val p = UTF8String.concat(SpacePad, base, SpacePad)
    val b = p.getBytes
    val nChars = p.numChars()
    // code-point start offsets (offs(nChars) = end sentinel)
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var ci = 0
    while (i < b.length) {
      offs(ci) = i
      ci += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    offs(nChars) = b.length
    val md = mdTl.get()
    var total = 0
    var w = 1
    while (w <= 3) { total += math.max(nChars - (w - 1), 1); w += 1 }
    val out = new Array[Int](total)
    var k = 0
    w = 1
    while (w <= 3) {
      val cnt = math.max(nChars - (w - 1), 1)
      var g = 0
      while (g < cnt) {
        val start = offs(g)
        val end = offs(math.min(g + w, nChars))
        md.reset()
        md.update(b, start, end - start)
        md.update(saltSuffix)
        val d = md.digest()
        out(k) = (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) % dim
        k += 1
        g += 1
      }
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Static kernel for [[NbScores]] — all K per-class Naive Bayes
  * scores in ONE pass over the gram-bucket sequence, replacing the
  * K interpreted `aggregate(gs, 0.0, acc + element_at(...))` folds
  * that dominated Y1 langid scoring (five folds × one interpreted
  * lambda call per gram; measured 82 s at 100× — the last
  * interpreted HOF in the langid path after the r16 gram fix).
  *
  * Bit-identity with the replaced folds: per class k the sum
  * accumulates SEQUENTIALLY in gram order from 0.0 (the K
  * accumulators advance in lockstep, so each class's addition order
  * is exactly the old per-class fold's), and the log-prior is added
  * AFTER the fold completes — `prior + (x1 + x2 + …)` — the grouping
  * the DuckDB twin's `prior + list_sum(...)` uses. The caller applies
  * Spark's own `round(_, 9)` on top, so the house pre-rank rounding
  * convention is untouched. */
object NbOps {
  /** `probsT` is the frozen log-probability table TRANSPOSED to
    * gram-major layout (`probsT(g*k + c)`), so each gram touches one
    * contiguous K-run — built once at expression resolution. NULL
    * gram sequences behave as empty (scores = priors alone). */
  def scores(gs: ArrayData, priors: Array[Double], probsT: Array[Double],
             k: Int): ArrayData = {
    val acc = new Array[Double](k)
    if (gs != null) {
      val n = gs.numElements()
      val dim = probsT.length / k
      var i = 0
      while (i < n) {
        val g = gs.getInt(i)
        if (g < 0 || g >= dim) {
          throw new IllegalArgumentException(
            s"graft_nb_scores: gram bucket $g outside the model's" +
              s" feature dim $dim — model/featurizer dim mismatch")
        }
        val base = g * k
        var c = 0
        while (c < k) { acc(c) += probsT(base + c); c += 1 }
        i += 1
      }
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) { out(c) = priors(c) + acc(c); c += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_nb_scores(gs, priors_lit, probs_lit)` → array<double> of
  * the K unrounded class scores `prior_k + Σ_j logProb_k(gs_j)`.
  * `priors` (K doubles) and `probs` (K×dim doubles, class-major
  * `k*dim + g`) arrive as foldable array literals, extracted once at
  * resolution — the frozen-literal oracle convention. */
case class NbScores(child: Expression, priors: IndexedSeq[Double],
                    probsFlat: IndexedSeq[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _)
        if priors.nonEmpty && probsFlat.size % priors.size == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_nb_scores table shape ${probsFlat.size} is not a multiple" +
        s" of ${priors.size} classes")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nb_scores expects array<int> gram buckets, got $dt")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_nb_scores"
  // never-null: a NULL gram sequence scores as empty (priors alone)
  override def nullable: Boolean = false
  private def k: Int = priors.size
  @transient private lazy val priorsArr: Array[Double] = priors.toArray
  @transient private lazy val probsT: Array[Double] = {
    val dim = probsFlat.size / k
    val t = new Array[Double](probsFlat.size)
    var g = 0
    while (g < dim) {
      var c = 0
      while (c < k) { t(g * k + c) = probsFlat(c * dim + g); c += 1 }
      g += 1
    }
    t
  }
  override def eval(input: InternalRow): Any =
    NbOps.scores(child.eval(input).asInstanceOf[ArrayData],
      priorsArr, probsT, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("nbPriors", priorsArr, "double[]")
    val tRef = ctx.addReferenceObj("nbProbsT", probsT, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.NbOps$$.MODULE$$.scores(
          ${c.isNull} ? null : ${c.value}, $pRef, $tRef, $k);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): NbScores =
    copy(child = newChild)
}

/** `graft_gram_buckets(text, salt_lit, dim_lit)` → array<int> of the
  * mixed 1/2/3-char-gram salted md5 buckets (the Y1 langid feature
  * stream). Salt and dim arrive as foldable literals, extracted once
  * at resolution. */
case class GramBuckets(child: Expression, salt: String, dim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_buckets dim must be >= 1, got $dim")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_buckets expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_gram_buckets"
  // never-null (NULL text behaves as empty text), like Shingles
  override def nullable: Boolean = false
  @transient private lazy val saltSuffix: Array[Byte] =
    (":" + salt).getBytes("UTF-8")
  override def eval(input: InternalRow): Any =
    GramOps.gramBuckets(child.eval(input).asInstanceOf[UTF8String],
      saltSuffix, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("gramSalt", saltSuffix, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.GramOps$$.MODULE$$.gramBuckets(
          ${c.isNull} ? null : ${c.value}, $sRef, $dim);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

/** `graft_char_grams(text, n)` → array<string> of the CHARACTER
  * n-grams of `text` — the fused replacement for the interpreted
  * `transform(sequence(1, length(text) - n + 1), i ->
  * substring(text, i, n))` chain (one lambda invocation + one
  * sequence array per gram). Code-point semantics match Spark's
  * `substring` exactly (UTF8 boundaries, not bytes); texts shorter
  * than n yield an EMPTY array, so callers keep the same
  * `length(text) >= n` guard the HOF form required (there,
  * sequence(1, 0) would DESCEND — this kernel is only substituted
  * behind that guard, where the two are element-identical). */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_char_grams n must be >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_char_grams expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_grams"
  override protected def nullSafeEval(input: Any): Any =
    GramOps.charGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.GramOps$$.MODULE$$.charGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

/** `graft_shingles(text, n, distinct)` → array<string> of the token
  * n-grams of `text`. */
case class Shingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles n must be >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  // never-null (NULL text behaves as empty text → [""]) — the
  // replaced HOF chain's exact behavior; see GramOps.shingles
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    GramOps.shingles(child.eval(input).asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.GramOps$$.MODULE$$.shingles(
          ${c.isNull} ? null : ${c.value}, $n, $distinct);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** `graft_gram_stats(text, n)` → array<bigint> `[total, distinct]`
  * n-gram counts. */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_stats n must be >= 1, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_stats expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_stats"
  // never-null ([1,1] for NULL text — the one empty gram), like
  // Shingles above
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    GramOps.gramStats(child.eval(input).asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.GramOps$$.MODULE$$.gramStats(
          ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

/** Static kernel for [[LmScore]] — the O4 char-trigram LM scoring
  * pass (per-doc: explode nChars−2 trigrams → look each up in the
  * frozen `(trigram, logp)` table → sequential (sum, count)) fused
  * into ONE pass, replacing the exploded 5·10⁸-row
  * `transform(sequence)` + broadcast join + doc-grain aggregation
  * that every lmScore consumer paid (q_lm_quality 60 s at 100×; the
  * epoch/ppl/RHO-1 family shares the stage).
  *
  * Bit-identity with the replaced chain: trigram i is the 3-CODE-
  * POINT substring at offset i (Spark `substring` semantics); the
  * sum accumulates in TEXT ORDER from 0.0 — exactly the order the
  * old per-doc Average partial saw, because a doc's exploded grams
  * all lived in one task in explode order — and the caller divides
  * sum by count exactly as Average's final `sum / count` did;
  * unknown trigrams price as the γ-floor literal, the old left-join
  * coalesce. The vocab arrives SORTED (binary UTF8 order, enforced
  * at resolution) and lookups are binary search — the BpeEncode
  * discipline. */
object LmOps {
  private def cmp(a: Array[Byte], b: Array[Byte], bs: Int, blen: Int): Int = {
    val n = math.min(a.length, blen)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(bs + i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - blen
  }

  /** `[n_grams, sum_logp]` of one text under the frozen table. NULL
    * or sub-trigram text yields (0, 0.0) — callers filter
    * `length(text) >= 3` exactly as the replaced chain did. */
  def lmScore(s: UTF8String, vocab: Array[Array[Byte]],
              logps: Array[Double], floor: Double): InternalRow = {
    if (s == null) return new GenericInternalRow(Array[Any](0L, 0.0))
    val b = s.getBytes
    var i = 0
    var nChars = 0
    while (i < b.length) {
      nChars += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    val n = nChars - 2
    if (n <= 0) return new GenericInternalRow(Array[Any](0L, 0.0))
    val offs = new Array[Int](nChars + 1)
    i = 0
    var ci = 0
    while (i < b.length) {
      offs(ci) = i
      ci += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    offs(nChars) = b.length
    var sum = 0.0
    var g = 0
    while (g < n) {
      val st = offs(g)
      val len = offs(g + 3) - st
      var lo = 0
      var hi = vocab.length - 1
      var hit = -1
      while (lo <= hi && hit < 0) {
        val mid = (lo + hi) >>> 1
        val c = cmp(vocab(mid), b, st, len)
        if (c == 0) hit = mid
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      sum += (if (hit >= 0) logps(hit) else floor)
      g += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, sum))
  }
}

/** `graft_lm_score(text, vocab_lit, logps_lit, floor_lit)` →
  * struct<n_grams: bigint, sum_logp: double>. The frozen model rides
  * as foldable array literals sorted in binary UTF8 order (re-sorted
  * defensively at resolution — a mis-sorted vocab would silently
  * break the binary search). */
case class LmScore(child: Expression, vocab: IndexedSeq[String],
                   logps: IndexedSeq[Double], floor: Double)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocab.size == logps.size =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_lm_score vocab/logps size mismatch: ${vocab.size} vs ${logps.size}")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_lm_score expects string, got $dt")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("sum_logp", DoubleType, nullable = false)))
  override def prettyName: String = "graft_lm_score"
  override def nullable: Boolean = false
  @transient private lazy val (vocabArr, logpArr) = {
    val pairs = vocab.zip(logps)
      .map { case (g, p) => (g.getBytes("UTF-8"), p) }
      .sortWith { (a, b) =>
        UTF8String.fromBytes(a._1).compareTo(UTF8String.fromBytes(b._1)) < 0
      }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }
  override def eval(input: InternalRow): Any =
    LmOps.lmScore(child.eval(input).asInstanceOf[UTF8String],
      vocabArr, logpArr, floor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("lmVocab", vocabArr, "byte[][]")
    val pRef = ctx.addReferenceObj("lmLogps", logpArr, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.plans.LmOps$$.MODULE$$.lmScore(
          ${c.isNull} ? null : ${c.value}, $vRef, $pRef, $floor);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
}
