package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** W3: LSH band-parameter auto-tuning — the published inversion of
  * W2's measured S-curve (Broder 1997; Leskovec–Rajaraman–Ullman
  * ch. 3: a banded MinHash family with b bands of r rows collides a
  * pair of Jaccard s with P = 1 − (1 − s^r)^b, threshold
  * ≈ (1/b)^(1/r)). W2 MEASURES the deployed (b=4, r=3) family;
  * this picks the family a deployment SHOULD run: enumerate every
  * (b, r) within the signature budget [[Dedup]].H = 12 hashes
  * (same sketch bytes per doc — the budget is the invariant a
  * tuner must respect, since signature width is the persisted
  * artifact), score each candidate against the CORPUS'S OWN pair
  * mass (W2's per-decile pair counts — the empirical Jaccard
  * distribution of the fixed 256-doc probe), and choose the
  * cheapest eligible family:
  *
  *  - `pred_recall_hi`: pair-mass-weighted analytic collision
  *    probability over deciles ≥ τ·10 (τ = [[TauTarget]]) — the
  *    recall the family would deliver on pairs the dedup MUST catch;
  *  - `pred_fp_load`: expected collided pair mass BELOW τ — the
  *    false-candidate load C4's verify pass would absorb (the
  *    verify pass is the expensive downstream, so this is the cost
  *    being minimized);
  *  - `eligible`: pred_recall_hi ≥ [[RecallTarget]] (false when the
  *    probe saw no hi-decile pair mass — recall is NULL/undefined);
  *  - `chosen`: the top-ranked candidate — eligible families first,
  *    then smallest fp load, ties to the smallest b, then r. With no
  *    eligible family the pick degrades to the minimal-fp-load
  *    family; `chosen && !eligible` marks that fallback visibly.
  *
  * Scale shape: the only corpus-scale work is W2's fixed 256-doc
  * probe (constant at any corpus size — the J3 lesson); the decile
  * table pivots to ONE row of integer counts (conditional LONG sums
  * — exact, order-independent, so no cross-row double accumulation
  * exists anywhere), and the 35-candidate scoring is a single
  * projection over that row. Analytic constants p_d(b, r) at decile
  * midpoints and the threshold (1/b)^(1/r) are computed DRIVER-side
  * with exact sequential multiply loops and ride both engines as
  * shortest-round-trip double literals (the frozen-literal oracle
  * convention), so the remaining per-row arithmetic is an identical
  * left-associated literal×count chain in Spark and DuckDB —
  * bit-identical without any decimal routing. */
object LshTune {

  /** Band boundary the dedup cares about: pairs with Jaccard ≥ τ are
    * "must catch" (deciles 5–9), below are verify-pass load. */
  val TauTarget = 0.5
  /** Minimum pair-mass-weighted predicted recall above τ. */
  val RecallTarget = 0.9

  /** All (b, r) with b·r ≤ H — every family the signature budget
    * admits (including degenerate r=1 OR-only and b=1 AND-only
    * rungs, which the scoring must price, not exclude a priori). */
  private[graft] def candidates: Seq[(Int, Int)] =
    for (r <- 1 to Dedup.H; b <- 1 to Dedup.H / r) yield (b, r)

  /** 1 − (1 − m^r)^b by exact sequential multiplication (no pow —
    * library pow is not bit-specified across engines; a multiply
    * loop is IEEE-exact in both). */
  private[graft] def pCollide(m: Double, b: Int, r: Int): Double = {
    var mr = 1.0
    var i = 0
    while (i < r) { mr *= m; i += 1 }
    val q = 1.0 - mr
    var qb = 1.0
    i = 0
    while (i < b) { qb *= q; i += 1 }
    1.0 - qb
  }

  /** Decile midpoint — the analytic curve's evaluation point for the
    * decile's pair mass. */
  private[graft] def midpoint(d: Int): Double = (d + 0.5) / 10.0

  private def thresholdOf(b: Int, r: Int): Double =
    math.pow(1.0 / b, 1.0 / r)

  private val HiFrom = (TauTarget * 10).toInt // deciles 5..9

  def lshTune(spark: SparkSession, dir: String): DataFrame =
    lshTuneFrom(spark, Dedup.lshRecallFrom(spark,
      Tables.documents(spark, dir)))

  /** Tuning over an arbitrary W2 table (jac_decile, n_pairs, …). */
  def lshTuneFrom(spark: SparkSession, w2: DataFrame): DataFrame = {
    // pivot the ≤10 decile rows to ONE row of exact integer counts
    val counts = w2.agg(
      sum(when(col("jac_decile") === 0, col("n_pairs")).otherwise(0L))
        .as("n_0"),
      (1 to 9).map(d =>
        sum(when(col("jac_decile") === d, col("n_pairs")).otherwise(0L))
          .as(s"n_$d")): _*)
    def n(d: Int): Column = col(s"n_$d")
    val rows = candidates.map { case (b, r) =>
      // left-associated literal×count chains — the identical
      // expression text rides the SQL twin
      val hiNum = (HiFrom to 9).map(d => lit(pCollide(midpoint(d), b, r)) *
        n(d).cast("double")).reduce(_ + _)
      val hiDen = (HiFrom to 9).map(n).reduce(_ + _)
      val fpLoad = (0 until HiFrom).map(d => lit(pCollide(midpoint(d), b, r)) *
        n(d).cast("double")).reduce(_ + _)
      struct(lit(b).as("b"), lit(r).as("r"),
        lit(math.rint(thresholdOf(b, r) * 1e6) / 1e6).as("threshold"),
        // a probe with NO hi-decile pair mass (e.g. a corpus whose
        // near-dups missed the fixed sample) has UNDEFINED recall —
        // NULL, never a 0/0 ANSI error
        when(hiDen === 0, lit(null).cast("double"))
          .otherwise(round(hiNum / hiDen.cast("double"), 6))
          .as("pred_recall_hi"),
        round(fpLoad, 6).as("pred_fp_load"))
    }
    val scored = counts
      .select(explode(array(rows: _*)).as("c"))
      .select(col("c.b").as("b"), col("c.r").as("r"),
        col("c.threshold").as("threshold"),
        col("c.pred_recall_hi").as("pred_recall_hi"),
        col("c.pred_fp_load").as("pred_fp_load"),
        coalesce(col("c.pred_recall_hi") >= RecallTarget, lit(false))
          .as("eligible"))
    // 35 rows — the window is a presentation-grain rank, not a
    // corpus-scale shuffle. Eligible families rank first; with NO
    // eligible family (no observed dup mass to demand recall of) the
    // pick degrades to the minimal false-candidate-load family — a
    // defined, defensible fallback the `eligible` column makes
    // visible (chosen && !eligible = fallback pick).
    val rn = row_number().over(Window.orderBy(
      when(col("eligible"), 0).otherwise(1),
      col("pred_fp_load"), col("b"), col("r")))
    scored
      .withColumn("chosen", rn === 1)
      .orderBy("b", "r")
  }

  // ---------------------------------------------------------------- W4
  /** The tuner's frozen pick for a dir (the OracleModelCache / P2
    * frozen-artifact convention: the chosen (b, r) rides the oracle
    * SQL as literals of the run it is compared against). */
  private val pickCache = new OracleModelCache[(Int, Int)]((spark, dir) => {
    val chosen = lshTune(spark, dir).where(col("chosen")).collect()
    require(chosen.length == 1,
      s"tuner must choose exactly one family, got ${chosen.length}")
    (chosen.head.getInt(0), chosen.head.getInt(1))
  })

  def pick(spark: SparkSession, dir: String): (Int, Int) =
    pickCache.model(spark, dir)

  /** W4: tuned-family validation — CLOSE the predict→measure loop W3
    * opened: actually RUN the chosen (b, r) family (re-banding the
    * same 12-hash md5 MinHash signature — the persisted sketch is
    * unchanged, banding is free at serve time, which is the point of
    * tuning under a fixed signature budget) over the same fixed
    * 256-doc probe, and emit per Jaccard decile the MEASURED collision
    * rate next to the tuner's ANALYTIC prediction at the decile
    * midpoint. `pred_err` is the honest-tuner signal: the analytic
    * curve assumes exchangeable min-hashes; a systematic gap here
    * would mean the md5 family breaks that assumption and W3's
    * inversion is optimizing a fiction. (Within-decile Jaccard spread
    * makes small gaps legitimate — decile-9 mass sits near 1.0, above
    * the 0.95 midpoint — so the gap is REPORTED, not gated; the spec
    * gates the structural invariants instead.)
    *
    * Scale shape: identical to W2 — one narrow corpus scan +
    * TakeOrdered(256); everything downstream touches ≤256 docs /
    * ≤32,640 pairs, constant at any corpus size. */
  def lshTunedCheck(spark: SparkSession, dir: String): DataFrame = {
    val (b, r) = pick(spark, dir)
    lshTunedCheckFrom(spark, Tables.documents(spark, dir), b, r)
  }

  def lshTunedCheckFrom(spark: SparkSession, docs: DataFrame,
                        b: Int, r: Int): DataFrame = {
    import graft.functions.Vectors
    val probe = docs.select("doc_id", "text")
      .orderBy(Sampling.hashBucket(col("doc_id"), Dedup.lshRecallSalt),
        col("doc_id"))
      .limit(Dedup.LshProbeN)
    // bounded (256-row) frame, two consumers: exact pairs + band keys
    val sh = probe.select(col("doc_id"),
      Vectors.shinglesFast(spark, col("text"), 3, distinct = true).as("sh"))
      .localCheckpoint()
    val pairs = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(broadcast(
        sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
    // the SAME H-hash signature, re-banded (b × r): band i keys on
    // hashes [i·r, i·r + r)
    val sig = sh.select(col("doc_id"),
      Vectors.minhashFast(spark, col("sh"), Dedup.H).as("mhs"))
    val bandStructs = (0 until b).map { i =>
      val ks = (0 until r).map(j => element_at(col("mhs"), i * r + j + 1))
      struct(lit(i).as("band"), md5(concat_ws("|", ks: _*)).as("key"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val coll = bands.select(col("doc_id").as("doc_a"), col("band"), col("key"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("key")),
        Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .withColumn("hit", lit(true))
    val pred = array((0 to 9).map(d =>
      lit(pCollide(midpoint(d), b, r))): _*)
    pairs.join(broadcast(coll), Seq("doc_a", "doc_b"), "left")
      .select(least(floor(col("jaccard") * 10).cast("int"), lit(9))
          .as("jac_decile"),
        when(coalesce(col("hit"), lit(false)), 1L).otherwise(0L).as("c"))
      .groupBy("jac_decile")
      .agg(count(lit(1)).as("n_pairs"), sum(col("c")).as("n_collide"))
      .select(col("jac_decile"), lit(b).as("b"), lit(r).as("r"),
        col("n_pairs"), col("n_collide"),
        round(col("n_collide").cast("double") / col("n_pairs"), 6)
          .as("p_collide"),
        round(element_at(pred, col("jac_decile") + 1), 6).as("p_pred"))
      .withColumn("pred_err",
        round(col("p_collide") - col("p_pred"), 6))
      .orderBy("jac_decile")
  }

  def lshTunedCheckSql: String = {
    val (b, r) = pickCache.oracleModel()
    def d2s(x: Double) = java.lang.Double.toString(x)
    val hb = Sampling.hashBucketSql("CAST(doc_id AS VARCHAR)",
      Dedup.lshRecallSalt)
    val mhs = (0 until Dedup.H).map(j =>
      s"list_aggregate(list_transform(sh, x -> md5('$j:' || x)), 'min') AS mh_$j")
      .mkString(",\n    ")
    val bandSelects = (0 until b).map { i =>
      val ks = (0 until r).map(j => s"mh_${i * r + j}").mkString(" || '|' || ")
      s"SELECT doc_id, $i AS band, md5($ks) AS key FROM m"
    }.mkString("\n  UNION ALL ")
    val predList = (0 to 9).map(d => d2s(pCollide(midpoint(d), b, r)))
      .mkString("[", ", ", "]")
    s"""WITH probe AS (
      |  SELECT doc_id, text FROM documents
      |  ORDER BY $hb, doc_id LIMIT ${Dedup.LshProbeN}),
      |s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(toks)-1, 2)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM probe)),
      |m AS (SELECT doc_id,
      |    $mhs
      |  FROM s),
      |bands AS (
      |  $bandSelects),
      |coll AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |    AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
      |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
      |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
      |      AS jaccard
      |  FROM s sa JOIN s sb ON sa.doc_id < sb.doc_id),
      |j AS (
      |  SELECT least(CAST(floor(p.jaccard * 10) AS INT), 9) AS jac_decile,
      |    CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS coll
      |  FROM pairs p LEFT JOIN coll c
      |    ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b),
      |agg AS (
      |  SELECT jac_decile, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(coll) AS BIGINT) AS n_collide
      |  FROM j GROUP BY jac_decile)
      |SELECT jac_decile, $b AS b, $r AS r, n_pairs, n_collide,
      |  round(CAST(n_collide AS DOUBLE) / n_pairs, 6) AS p_collide,
      |  round(list_extract($predList, jac_decile + 1), 6) AS p_pred,
      |  round(round(CAST(n_collide AS DOUBLE) / n_pairs, 6) -
      |    round(list_extract($predList, jac_decile + 1), 6), 6) AS pred_err
      |FROM agg
      |ORDER BY jac_decile""".stripMargin
  }

  // ---------------------------------------------------------------- W5
  /** W5: the tuner's pick taken ALL THE WAY through C2's real pair
    * pipeline — re-band the SAME persisted 12-hash signatures at the
    * chosen (b, r), run the full candidate→exact-Jaccard-verify path
    * over the whole corpus, and set the result beside the fixed
    * (4, 3) family's: per family the candidate count (the verify load
    * a deployment pays), the verified-dup yield at the C4 τ = 0.8
    * bar, the false-candidate count the verify pass absorbed, and the
    * verified pairs ONLY this family found (the recall trade made
    * concrete as an exact pair-set diff, not a prediction). One
    * signature pass feeds both bandings — re-banding is serve-time
    * free, which is W3's premise and this query's proof.
    *
    * Scale shape: the signature pipeline is narrow and runs ONCE;
    * each family adds one band-key shuffle + capped bucket pair
    * explode (the C2/C4 shape, already priced) and the pair-set diff
    * is an anti-join on (doc_a, doc_b) — no all-pairs anywhere. */
  val VerifyTau = 0.8

  def lshReband(spark: SparkSession, dir: String): DataFrame = {
    val (tb, tr) = pick(spark, dir)
    lshRebandFrom(spark, Tables.documents(spark, dir), tb, tr)
  }

  def lshRebandFrom(spark: SparkSession, docs: DataFrame,
                    tb: Int, tr: Int): DataFrame = {
    // Materialize the shared VERIFIED-PAIR stages (guide §5: reuse
    // over recompute): each family's pair set is consumed THREE times
    // below (own aggregate, own dup set, the other family's
    // anti-join) — without the checkpoints the whole verify pipeline
    // (and under it the shingle+minhash subtree) appeared up to 6× in
    // one 1064-line plan and re-ran per consumer (measured 3.1 → 2.4 s
    // at sf0.1; at 100 TB each re-run is a corpus-scale signature
    // pass). The pair sets are bounded (candidate-pair-sized), so the
    // checkpoint is cheap at any scale. The SIGNATURE frame itself is
    // deliberately NOT checkpointed: it carries the per-doc shingle
    // arrays, and materializing ~KB/doc at the 100× corpus measured
    // 1.6× WORSE than recomputing the narrow signature pass once per
    // family (23.5 s vs 14.8 s) — payload materialization lost to
    // recompute, the §5 caching trade-off read from the data.
    // the two families' builds are independent — materialize them
    // CONCURRENTLY (Reporting.parStages) so the wall cost is
    // max(family) not sum (serial checkpoints measured 19-21 s at the
    // 100× corpus vs 14.8 s for the fully-lazy shape, because lazy
    // recompute ran the duplicated subtrees in parallel inside one
    // job; parallel checkpoints keep both properties)
    val sig = Dedup.shingledSig(spark, docs)
    val Seq(verF, verT) = Reporting.parStages(
      () => Dedup.verifiedPairsAt(spark, sig, Dedup.Bands, Dedup.R)
        .localCheckpoint(),
      () => Dedup.verifiedPairsAt(spark, sig, tb, tr).localCheckpoint())
    def dups(v: DataFrame) = v.where(col("jaccard") >= VerifyTau)
      .select("doc_a", "doc_b")
    def famRow(name: String, b: Int, r: Int, ver: DataFrame,
               other: DataFrame): DataFrame =
      // coalesce: sum() over an EMPTY candidate set is NULL while the
      // DuckDB twin's count(*)-shaped aggregates emit 0 — a family
      // producing zero candidates (degenerate/tiny corpus) must not
      // break the hash gate on null-vs-0
      ver.agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(when(col("jaccard") >= VerifyTau, 1L).otherwise(0L)),
            lit(0L)).as("n_verified"),
          coalesce(sum(when(col("jaccard") < VerifyTau, 1L).otherwise(0L)),
            lit(0L)).as("n_fp"))
        .crossJoin(dups(ver).join(dups(other),
          Seq("doc_a", "doc_b"), "left_anti")
          .agg(count(lit(1)).as("n_only_here")))
        .select(lit(name).as("family"), lit(b).as("b"), lit(r).as("r"),
          col("n_candidates"), col("n_verified"), col("n_fp"),
          col("n_only_here"))
    famRow("fixed", Dedup.Bands, Dedup.R, verF, verT)
      .unionByName(famRow("tuned", tb, tr, verT, verF))
      .orderBy("family")
  }

  /** DuckDB twin: both families rebuilt from the same shingle + 12-hash
    * signature CTEs, full candidate→verify per family, exact-integer
    * aggregates + the anti-join pair-set diff. */
  def lshRebandSql: String = {
    val (tb, tr) = pickCache.oracleModel()
    s"""WITH ${Dedup.shingledSigSqlCtes("documents")},
      |${Dedup.verifiedPairsSqlCtes("f", Dedup.Bands, Dedup.R)},
      |${Dedup.verifiedPairsSqlCtes("t", tb, tr)},
      |df AS (SELECT doc_a, doc_b FROM ver_f WHERE jaccard >= $VerifyTau),
      |dt AS (SELECT doc_a, doc_b FROM ver_t WHERE jaccard >= $VerifyTau)
      |SELECT * FROM (
      |  SELECT 'fixed' AS family, ${Dedup.Bands} AS b, ${Dedup.R} AS r,
      |    (SELECT CAST(count(*) AS BIGINT) FROM ver_f) AS n_candidates,
      |    (SELECT CAST(count(*) AS BIGINT) FROM df) AS n_verified,
      |    (SELECT CAST(count(*) AS BIGINT) FROM ver_f
      |       WHERE jaccard < $VerifyTau) AS n_fp,
      |    (SELECT CAST(count(*) AS BIGINT) FROM df
      |       WHERE NOT EXISTS (SELECT 1 FROM dt
      |         WHERE dt.doc_a = df.doc_a AND dt.doc_b = df.doc_b))
      |      AS n_only_here
      |  UNION ALL
      |  SELECT 'tuned', $tb, $tr,
      |    (SELECT CAST(count(*) AS BIGINT) FROM ver_t),
      |    (SELECT CAST(count(*) AS BIGINT) FROM dt),
      |    (SELECT CAST(count(*) AS BIGINT) FROM ver_t
      |       WHERE jaccard < $VerifyTau),
      |    (SELECT CAST(count(*) AS BIGINT) FROM dt
      |       WHERE NOT EXISTS (SELECT 1 FROM df
      |         WHERE df.doc_a = dt.doc_a AND df.doc_b = dt.doc_b)))
      |ORDER BY family""".stripMargin
  }

  def lshTuneSql: String = {
    def d2s(x: Double) = java.lang.Double.toString(x)
    val countCols = (0 to 9).map(d =>
      s"CAST(sum(CASE WHEN jac_decile = $d THEN n_pairs ELSE 0 END) AS BIGINT) AS n_$d")
      .mkString(",\n    ")
    val rowSelects = candidates.map { case (b, r) =>
      val hiNum = (HiFrom to 9).map(d =>
        s"${d2s(pCollide(midpoint(d), b, r))} * CAST(n_$d AS DOUBLE)")
        .mkString(" + ")
      val hiDen = (HiFrom to 9).map(d => s"n_$d").mkString(" + ")
      val fpLoad = (0 until HiFrom).map(d =>
        s"${d2s(pCollide(midpoint(d), b, r))} * CAST(n_$d AS DOUBLE)")
        .mkString(" + ")
      s"""SELECT $b AS b, $r AS r,
         |    ${d2s(math.rint(thresholdOf(b, r) * 1e6) / 1e6)} AS threshold,
         |    CASE WHEN ($hiDen) = 0 THEN NULL
         |         ELSE round(($hiNum) / CAST($hiDen AS DOUBLE), 6) END
         |      AS pred_recall_hi,
         |    round($fpLoad, 6) AS pred_fp_load
         |  FROM counts""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH w2 AS (${Dedup.lshRecallSql}),
      |counts AS (
      |  SELECT
      |    $countCols
      |  FROM w2),
      |cand AS (
      |  $rowSelects),
      |scored AS (
      |  SELECT b, r, threshold, pred_recall_hi, pred_fp_load,
      |    coalesce(pred_recall_hi >= $RecallTarget, false) AS eligible
      |  FROM cand),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY
      |      CASE WHEN eligible THEN 0 ELSE 1 END,
      |      pred_fp_load, b, r) AS rn
      |  FROM scored)
      |SELECT b, r, threshold, pred_recall_hi, pred_fp_load, eligible,
      |  (rn = 1) AS chosen
      |FROM ranked
      |ORDER BY b, r""".stripMargin
  }
}
