package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Serialized bloom bytes with IDENTITY-first, digest-cached equality:
  * a case-class field of 10⁶ boxed bytes made every expression
  * hashCode/equals call O(|filter|), and Catalyst calls both
  * constantly during analysis/optimization (semanticEquals,
  * canonicalization, rule maps) — measured ~1.6 s of driver time per
  * rep on q_bloom_join's ~0.9 MB filter. The hash is computed once at
  * construction; equals short-circuits on reference, then hash, and
  * only byte-compares on a genuine collision. */
final class BloomBytes(val bytes: Array[Byte]) extends Serializable {
  override val hashCode: Int = java.util.Arrays.hashCode(bytes)
  override def equals(o: Any): Boolean = o match {
    case b: BloomBytes => (this eq b) ||
      (hashCode == b.hashCode && java.util.Arrays.equals(bytes, b.bytes))
    case _ => false
  }
}

/** Per-row bloom-filter membership probe over a long key — the
  * application side of a hand-rolled runtime join filter (J6). The
  * serialized filter arrives as a foldable binary literal (bounded
  * model state, the PqEncode codebook pattern) and is deserialized
  * ONCE per executor into Spark's public `util.sketch.BloomFilter`;
  * each row then costs `numHashFunctions` bit probes inside
  * WholeStageCodegen — no UDF, no per-row deserialization.
  *
  * `mightContainLong` is one-sided: false positives pass (and are
  * removed by the exact join that follows), false negatives cannot
  * happen — pruning can only cost rows forwarded, never correctness.
  */
case class BloomMightContain(child: Expression, bloom: BloomBytes)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain expects a BIGINT key, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloom.bytes))

  override protected def nullSafeEval(k: Any): Any =
    bf.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("graftBloom", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $bfRef.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
