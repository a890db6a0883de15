package graft.plans

/** Immutable IndexedSeq with a ONE-TIME content hash and
  * identity-first equality — the carrier for frozen model state
  * (codebooks, vocabularies, LUTs) living as fields of native
  * Catalyst expressions.
  *
  * Why it exists: Catalyst calls `hashCode`/`equals` on expression
  * trees constantly (semanticEquals, canonicalization, rule maps,
  * AQE replans), and a case-class field holding a plain
  * IndexedSeq of 10⁴-10⁵ boxed elements makes every such call O(n) —
  * measured as multi-second driver gaps on the PQ/ADC queries whose
  * expressions carry 16k-float codebooks and 80k-double LUT tables.
  * Content semantics are unchanged: the hash is the standard Scala
  * seq hash (computed once at construction), equality is
  * reference-first, then hash, then element-wise only on a genuine
  * collision — so two expressions with different frozen state still
  * compare unequal, and canonicalized duplicates still dedup. */
final class FrozenSeq[T](underlying: IndexedSeq[T])
    extends IndexedSeq[T] with Serializable {
  def apply(i: Int): T = underlying(i)
  def length: Int = underlying.length
  override val hashCode: Int = underlying.hashCode
  override def equals(o: Any): Boolean = o match {
    case f: FrozenSeq[_] =>
      (this eq f) || (hashCode == f.hashCode && super.equals(o))
    case _ => super.equals(o)
  }
}

object FrozenSeq {
  def apply[T](s: IndexedSeq[T]): FrozenSeq[T] = new FrozenSeq(s)
}
