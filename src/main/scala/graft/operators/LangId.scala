package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Trained language ID — hashed char-trigram multinomial Naive Bayes,
  * the published n-gram langid baseline (Cavnar & Trenkle 1994's
  * n-gram profiles in their probabilistic form; langid.py, Lui &
  * Baldwin 2012, is NB over byte n-grams) — replacing E1's five-word
  * stopword heuristic, whose weakness N2's confusion matrix documents
  * (en-ish guesses under every declared tag).
  *
  * Model: per declared lang k, a smoothed log-probability table over
  * [[LDim]] hashed trigram buckets — log((c_kj + 1) / (c_k + LDim)) —
  * plus the log-prior log(n_k / n). Training is CLOSED-FORM: one
  * explode + groupBy((lang, bucket)) count over a hash-capped sample
  * ([[TrainCap]], the P2 discipline), collected as a ≤ K·LDim-row
  * integer table; the log tables are derived DRIVER-side and frozen
  * (the frozen-literal oracle convention) — no iterative steps, so
  * training is one aggregation job at any corpus size.
  *
  * Scoring is one narrow pass, no shuffle: per doc, per class, the
  * log-prior plus a SEQUENTIAL left fold of the trigram sequence over
  * the frozen table (multiset NB — repeated grams count repeatedly);
  * argmax with ascending-lang tie order. Both engines fold identical
  * literal doubles over the identical gram sequence, so scores are
  * bit-identical and the argmax is deterministic cross-engine.
  *
  * Weak supervision caveat, stated honestly: labels are the corpus's
  * DECLARED lang tags. On the synthetic fixture corpus the text
  * carries no real per-lang signal (every tag wraps the same token
  * soup — N2's finding), so there the model learns priors + noise;
  * the hash gate pins determinism of train+score, and the accuracy
  * claim over E1 is gated on a planted real-multilingual fixture in
  * LangIdSpec, where NB separates languages E1's word list cannot
  * (e.g. capitalized German nouns, Spanish/French diacritics, zh
  * script — all invisible to a 20-word stopword table). */
object LangId {

  /** Hashed trigram bucket count per class. 256 keeps the full model
    * (K langs × LDim doubles) comfortably literal-sized in the oracle
    * SQL while leaving trigram collision rates low enough for
    * language separation (languages differ on hundreds of frequent
    * trigrams, not a handful). */
  val LDim = 256
  /** Training-set bound, the P2 discipline: a hash-capped sample
    * (salted-md5 order) — an NB trigram table saturates long before
    * 10⁵ docs; training cost must not grow with the corpus. */
  val TrainCap = 100000
  private val Salt = "lid"

  case class LangIdModel(langs: IndexedSeq[String],
                         logPrior: IndexedSeq[Double],
                         logProb: IndexedSeq[IndexedSeq[Double]],
                         nTrain: Long)

  /** Mixed 1-/2-/3-gram bucket sequence of a text column — the
    * Cavnar–Trenkle profile shape (they use 1–5-grams): unigrams
    * carry the SCRIPT signal (han characters, diacritics — the
    * features that separate zh or accented Romance text even when no
    * longer gram recurs across documents), trigrams the morphology.
    * Lowercased, space-padded (word-boundary grams), each gram hashed
    * to [0, LDim) via the portable salted md5. Multiset, emitted in
    * fixed order (all 1-grams, then 2-grams, then 3-grams, each in
    * text order) — both engines produce the identical sequence.
    *
    * NATIVE ([[graft.plans.GramBuckets]], one fused md5 loop): the
    * portable HOF chain ([[gramsOfPortable]], kept as the equality
    * spec's ground truth) ran one interpreted md5 per gram and
    * measured 800 s at 100× once projection collapse substituted it
    * into all five per-class scores. */
  private def gramsOf(spark: SparkSession, text: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_gram_buckets",
      coalesce(text, lit("")), lit(Salt), lit(LDim))
  }

  /** The spelled-out built-in formulation — mirrors the DuckDB twin
    * term for term; LangIdSpec pins the native expression against it
    * bit-for-bit. */
  private[graft] def gramsOfPortable(text: Column): Column = {
    val p = concat(lit(" "), lower(coalesce(text, lit(""))), lit(" "))
    def width(w: Int, stop: Column): Column =
      transform(sequence(lit(1), stop), i =>
        (Sampling.hashBucket(substring(p, i, lit(w)), Salt) % LDim)
          .cast("int"))
    concat(
      width(1, length(p)),
      width(2, greatest(length(p) - 1, lit(1))),
      width(3, greatest(length(p) - 2, lit(1))))
  }

  private def gramsOfSql(text: String): String = {
    val p = s"(' ' || lower(coalesce($text, '')) || ' ')"
    def width(w: Int, stop: String): String = {
      val g = s"substring($p, CAST(i AS INTEGER), $w)"
      s"list_transform(range(1, $stop + 1), " +
        s"i -> CAST(${Sampling.hashBucketSql(s"($g)", Salt)} % $LDim AS INT))"
    }
    s"(${width(1, s"length($p)")} || " +
      s"${width(2, s"greatest(length($p) - 1, 1)")} || " +
      s"${width(3, s"greatest(length($p) - 2, 1)")})"
  }

  // --------------------------------------------------------- training
  private[graft] def train(spark: SparkSession, docs: DataFrame): LangIdModel = {
    // cap FIRST on the slim (doc_id, lang, text) projection, THEN
    // featurize: a projection carrying gramsOf under the TakeOrdered
    // would hash every gram of every corpus doc just to pick 100k
    val capped = docs
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":lidtrain"))))
      .limit(TrainCap)
      .select(col("doc_id"), col("lang"),
        gramsOf(spark, col("text")).as("gs"))
      .localCheckpoint() // two consumers (priors + gram counts)
    val nDocs = capped.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(nDocs.nonEmpty, "no labeled docs to train langid on")
    val langs = nDocs.keys.toIndexedSeq.sorted
    val counts = capped.select(col("lang"), explode(col("gs")).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val n = nDocs.values.sum
    val logPrior = langs.map(k => math.log(nDocs(k).toDouble / n))
    val logProb = langs.map { k =>
      val ck = (0 until LDim).map(j => counts.getOrElse((k, j), 0L)).sum
      (0 until LDim).map(j =>
        math.log((counts.getOrElse((k, j), 0L) + 1).toDouble / (ck + LDim)))
    }
    LangIdModel(langs, logPrior, logProb, n)
  }

  private val cache = new OracleModelCache[LangIdModel](
    (spark, dir) => train(spark, Tables.documents(spark, dir)))

  def model(spark: SparkSession, dir: String): LangIdModel =
    cache.model(spark, dir)

  // ---------------------------------------------------------- scoring
  /** Per-class score column, the SPELLED-OUT formulation: log-prior +
    * sequential fold of the gram sequence over the frozen table. The
    * prior is added OUTSIDE the fold — `prior + (x1 + x2 + …)` —
    * because the SQL twin is `prior + list_sum(...)`, and the two
    * groupings differ in floating point; with the fold from 0.0 both
    * engines sum the identical grouping (the P2 margin convention).
    * Rounded to 9 dp before the argmax (the house pre-rank
    * convention) so a sub-1e-9 engine ulp can never flip the
    * predicted class.
    *
    * Kept as LangIdSpec's ground truth for the NATIVE kernel
    * ([[graft.plans.NbOps]], one codegen'd pass computing all K
    * scores): the production path ran K of these interpreted folds —
    * one interpreted lambda call per gram per class, measured 82 s at
    * 100× as the dominant langid cost after the r16 gram fix. */
  private[graft] def scoreOfPortable(gs: Column, prior: Double,
                                     lp: IndexedSeq[Double]): Column =
    round(lit(prior) + aggregate(gs, lit(0.0), (acc, g) =>
      acc + element_at(array(lp.map(lit): _*), g + 1)), 9)

  /** All K unrounded class scores in one native pass (same fold
    * order per class as [[scoreOfPortable]], bit-identical — pinned
    * in LangIdSpec); the frozen tables ride as foldable array
    * literals. */
  private[graft] def nbScoresNative(spark: SparkSession, gs: Column,
                                    m: LangIdModel): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function("graft_nb_scores", gs,
      typedlit(m.logPrior), typedlit(m.logProb.flatten))
  }

  def langidTrained(spark: SparkSession, dir: String): DataFrame = {
    val m = model(spark, dir)
    langidTrainedFrom(Tables.documents(spark, dir), m)
  }

  /** Scoring over an arbitrary (doc_id, text[, lang]) frame with a
    * frozen model — narrow and stateless (stream-safe); presentation
    * sort on batch frames only. */
  def langidTrainedFrom(docs: DataFrame, m: LangIdModel): DataFrame = {
    val spark = docs.sparkSession
    // ONE native pass (gram hashing fused with all K score folds);
    // explode(array(...)) is a Generate — a projection-collapse
    // BARRIER — so the kernel runs ONCE per row even though the
    // argmax below references every score several times (without it
    // CollapseProject substitutes the whole kernel into each
    // reference — the measured 5× detonation of the interpreted era)
    val withScores = docs
      .select(col("doc_id"),
        (if (docs.columns.contains("lang")) col("lang")
         else lit(null).cast("string")).as("lang_declared"),
        explode(array(nbScoresNative(spark,
          gramsOf(spark, col("text")), m))).as("sv"))
    // 9-dp pre-rank rounding (house convention) applied by Spark's
    // own round on the attribute — cheap codegen'd re-reads
    def s(i: Int) = round(element_at(col("sv"), i + 1), 9)
    val best = m.langs.indices.map(s).reduce(greatest(_, _))
    // argmax, ascending-lang tie order (scores are bit-identical
    // cross-engine, so the comparison chain resolves identically)
    val pred = m.langs.indices.tail.foldLeft(
      when(s(0) === best, m.langs(0))) { (acc, i) =>
        acc.when(s(i) === best, m.langs(i))
      }
    val scored = withScores.select(col("doc_id"), col("lang_declared"),
      pred.as("lang_pred"), round(best, 6).as("lp_best"))
    // presentation sort only — and through an exchange (the
    // qFingerprints device): a global sort's range-sampling pass
    // re-executes its child lineage, and with a purely narrow child
    // that means the whole gram-hash + scoring pass runs TWICE; the
    // repartition materializes it once and the sampler reads shuffle
    // files
    if (docs.isStreaming) scored
    else scored.repartition(col("doc_id")).orderBy("doc_id")
  }

  /** DuckDB twin: the frozen log tables ride the SQL as list literals
    * (shortest-round-trip Double.toString — exact bits on any IEEE
    * reader); same sequential fold, same argmax tie order. */
  def langidTrainedSql: String = {
    val m = cache.oracleModel()
    def dlist(xs: IndexedSeq[Double]) =
      xs.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val scores = m.langs.indices.map { i =>
      s"round(${java.lang.Double.toString(m.logPrior(i))} + " +
        s"list_sum(list_transform(gs, g -> " +
        s"list_extract(${dlist(m.logProb(i))}, g + 1))), 9) AS s_$i"
    }.mkString(",\n      |    ")
    val best = m.langs.indices.map(i => s"s_$i").mkString("greatest(", ", ", ")")
    val pred = m.langs.indices.map(i =>
      s"WHEN s_$i = mx THEN '${m.langs(i)}'").mkString(" ")
    s"""WITH g AS (
      |  SELECT doc_id, lang AS lang_declared, ${gramsOfSql("text")} AS gs
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang_declared,
      |    $scores
      |  FROM g),
      |m AS (SELECT *, $best AS mx FROM s)
      |SELECT doc_id, lang_declared,
      |  CASE $pred END AS lang_pred,
      |  round(mx, 6) AS lp_best
      |FROM m
      |ORDER BY doc_id""".stripMargin
  }
}
