package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Y3: winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every K-token gram, slide
  * a window of W consecutive gram hashes, and keep each window's
  * MINIMUM hash (ties to the RIGHTMOST position). The selected
  * (position, hash) set is the document's fingerprint, with the
  * paper's two guarantees: (1) any substring match of at least
  * t = W + K − 1 tokens produces at least one SHARED fingerprint
  * (every length-W window inside the match selects from the same
  * hashes), and (2) expected density is 2/(W+1) of the grams — a
  * BOUNDED per-doc artifact, which is what S1's full gram index is
  * not: S1 answers "remove every duplicated span" by carrying every
  * gram; winnowing answers "which doc PAIRS share material" carrying
  * ~2n/(W+1) hashes per doc.
  *
  * Construction is IN-ARRAY per doc (the X1 discipline): native
  * `graft_shingles` grams → one md5 per gram → window minima by
  * lambda-bound array ops — no per-gram explode, no window function;
  * the one explode is at fingerprint grain (~2/(W+1) density). Pair
  * detection is the C2 bucket-join shape: fingerprints equi-join on
  * the hash, so candidate generation is sub-quadratic at any corpus
  * size (never all-pairs). Hot fingerprints (boilerplate) concentrate
  * a bucket exactly like a hot LSH band — the L2 boilerplate scrub
  * runs upstream in a production pipeline; the fixture corpus has no
  * such key (shared grams cap at the planted near-dup families).
  *
  * Engine determinism: gram hashes are md5 hex strings (identical in
  * both engines), the window minimum is the lexicographic string min,
  * and the rightmost-tie rule is an integer position fold — no floats
  * anywhere. */
object Winnowing {

  /** Gram width in tokens. */
  val K = 3
  /** Window: consecutive gram hashes per selection. */
  val W = 4
  /** Detection guarantee: shared runs of ≥ this many tokens. */
  val GuaranteeTokens: Int = W + K - 1

  /** Per-doc fingerprint set: (doc_id, pos, fp) — pos is the 1-based
    * gram index the selected hash sits at (rightmost minimum of its
    * window), fp the md5 hex of the K-token gram. Distinct: adjacent
    * windows usually re-select the same (pos, fp). */
  def fingerprintsFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val grams = call_function("graft_shingles",
      coalesce(col("text"), lit("")), lit(K), lit(false))
    // lambda-bind the hash array (the X1/cdcChunks device: Catalyst
    // re-evaluates a subtree at every reference inside a lambda, so
    // the md5 pass must be bound once per row)
    val fps = flatten(transform(array(transform(grams, g => md5(g))), gh =>
      transform(sequence(lit(1), greatest(size(gh) - W + 1, lit(1))), { i =>
        val win = slice(gh, i, lit(W))
        val mn = array_min(win)
        // rightmost position of the minimum inside the window: an
        // integer fold keeping the LAST matching index
        val rel = aggregate(sequence(lit(1), size(win)), lit(0), (acc, j) =>
          when(element_at(win, j) === mn, j).otherwise(acc))
        struct((i + rel - 1).cast("long").as("pos"), mn.as("fp"))
      })))
    docs
      .select(col("doc_id"), explode(fps).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.fp").as("fp"))
      .distinct()
  }

  /** The gated fingerprint query: every doc's selected fingerprints,
    * totally ordered for the hash compare. */
  def qFingerprints(spark: SparkSession, dir: String): DataFrame =
    fingerprintsFrom(spark, Tables.documents(spark, dir))
      .orderBy("doc_id", "pos", "fp")

  /** Candidate copy pairs: docs sharing ≥1 fingerprint VALUE, with
    * the shared-value count (the MOSS ranking signal). The join is on
    * the fingerprint hash — the C2 bucket shape, sub-quadratic. */
  def winnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairsFrom(spark, Tables.documents(spark, dir))

  def winnowPairsFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    val fp = fingerprintsFrom(spark, docs)
      .select("doc_id", "fp").distinct()
    fp.select(col("doc_id").as("doc_a"), col("fp"))
      .join(fp.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_fp"))
      .orderBy("doc_a", "doc_b")
  }

  private def fpSqlCtes: String = {
    val gram = s"md5(array_to_string(toks[i:i+${K - 1}], ' '))"
    val win = s"gh[i:i+${W - 1}]"
    s"""t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
      |       FROM documents),
      |g AS (SELECT doc_id,
      |        list_transform(range(1, greatest(len(toks) - ${K - 1}, 1) + 1),
      |          i -> $gram) AS gh
      |      FROM t),
      |w AS (SELECT doc_id, gh, unnest(range(1,
      |          greatest(len(gh) - ${W - 1}, 1) + 1)) AS i
      |      FROM g),
      |sel AS (SELECT doc_id,
      |          CAST(i + list_max(list_transform(range(1, len($win) + 1),
      |            j -> CASE WHEN ($win)[j] = list_aggregate($win, 'min')
      |                 THEN j ELSE 0 END)) - 1 AS BIGINT) AS pos,
      |          list_aggregate($win, 'min') AS fp
      |        FROM w),
      |fps AS (SELECT DISTINCT doc_id, pos, fp FROM sel)""".stripMargin
  }

  def qFingerprintsSql: String =
    s"""WITH $fpSqlCtes
      |SELECT doc_id, pos, fp FROM fps
      |ORDER BY doc_id, pos, fp""".stripMargin

  def winnowPairsSql: String =
    s"""WITH $fpSqlCtes,
      |fv AS (SELECT DISTINCT doc_id, fp FROM fps)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(count(*) AS BIGINT) AS n_shared_fp
      |FROM fv a JOIN fv b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY doc_a, doc_b
      |ORDER BY doc_a, doc_b""".stripMargin
}
