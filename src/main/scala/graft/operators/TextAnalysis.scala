package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Portable, Vectors}
import graft.sources.Tables

/** Text-analysis operators over the `documents` table (E1-E4):
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All expressions are narrow per-row built-ins (no shuffle at all —
  * these queries are a single scan and stay in one WholeStageCodegen
  * span), so they scale embarrassingly: 100 TB of documents is just
  * more partitions. Every primitive is portable (see
  * [[graft.functions.Portable]]) so the DuckDB oracle reproduces the
  * exact bits; double arithmetic is derived from integers with the
  * same operation order on both engines (IEEE-identical).
  */
object TextAnalysis {

  /** Stopword sets for the n-gram language-ID heuristic. Deterministic
    * argmax with fixed tie order (en > es > fr > de, 'und' when all
    * zero). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "les", "est", "une", "et"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  // ---------------------------------------------------------------- E1
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val p = Portable.padded(col("text"))
    val scores = stopwords.map { case (lang, ws) =>
      lang -> Portable.stopwordHits(p, ws)
    }
    val Seq(en, es, fr, de) = scores.map(_._2)
    val guess = when(en + es + fr + de === 0, "und")
      .when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        en.as("s_en"), es.as("s_es"), fr.as("s_fr"), de.as("s_de"),
        guess.as("lang_guess"), col("lang").as("lang_declared"))
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    val p = Portable.paddedSql("text")
    val Seq(en, es, fr, de) =
      stopwords.map { case (_, ws) => Portable.stopwordHitsSql(p, ws) }
    s"""SELECT doc_id, $en AS s_en, $es AS s_es, $fr AS s_fr, $de AS s_de,
      |  CASE WHEN $en + $es + $fr + $de = 0 THEN 'und'
      |       WHEN $en >= $es AND $en >= $fr AND $en >= $de THEN 'en'
      |       WHEN $es >= $fr AND $es >= $de THEN 'es'
      |       WHEN $fr >= $de THEN 'fr'
      |       ELSE 'de' END AS lang_guess,
      |  lang AS lang_declared
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- N2
  /** N2: language confusion matrix — E1's detector crossed against the
    * declared metadata label, the audit that answers "is a source's
    * `lang` tag trustworthy?" before J5 splits or H10 mix decisions
    * key on it. Each (declared, guessed) cell counts docs and carries
    * the n_agree integer so per-language accuracy is a ratio of two
    * audited counts, never a float aggregated across engines.
    *
    * Scale shape: E1's narrow per-row detector (single scan, one
    * WholeStageCodegen span) followed by ONE #langs² aggregation —
    * the same partial-agg → k-row exchange as any low-cardinality
    * groupBy; output is ≤ |langs|·(|langs|+1) rows at any corpus
    * size. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir)
      .groupBy(col("lang_declared"), col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("agree", col("lang_declared") === col("lang_guess"))
      .select("lang_declared", "lang_guess", "agree", "n_docs")
      .orderBy("lang_declared", "lang_guess")

  val langConfusionSql: String =
    s"""SELECT lang_declared, lang_guess,
      |  lang_declared = lang_guess AS agree,
      |  count(*) AS n_docs
      |FROM ($langIdSql) e
      |GROUP BY 1, 2
      |ORDER BY lang_declared, lang_guess""".stripMargin

  // ---------------------------------------------------------------- E2
  /** The blended [0,1] quality score as a reusable per-row expression
    * (shared by E2's report and O3's curriculum phase binning, so the
    * two can never disagree on what "quality" means). */
  def qualityScore(text: Column): Column = {
    val nTok = Portable.nTokens(text)
    val nTypes = size(array_distinct(split(text, " "))).cast("long")
    lit(0.5) * least(lit(1.0), nTok.cast("double") / 100.0) +
      lit(0.5) * (nTypes.cast("double") / nTok)
  }

  /** DuckDB twin of [[qualityScore]]. */
  def qualityScoreSql(text: String): String = {
    val nTok = Portable.nTokensSql(text)
    val nTypes = s"CAST(len(list_distinct(string_split($text, ' '))) AS BIGINT)"
    s"(0.5 * least(1.0, CAST($nTok AS DOUBLE) / 100.0) " +
      s"+ 0.5 * (CAST($nTypes AS DOUBLE) / $nTok))"
  }

  /** Quality scoring: token count, type-token ratio, mean token
    * length, and a blended [0,1] score. Double math is int-derived
    * with identical operation order on both engines. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val nTok = Portable.nTokens(col("text"))
    val nTypes = size(array_distinct(split(col("text"), " "))).cast("long")
    val ttr = nTypes.cast("double") / nTok
    val avgTokLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.as("n_tokens"), nTypes.as("n_types"),
        ttr.as("ttr"), avgTokLen.as("avg_token_len"),
        qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")
  }

  val qualitySql: String = {
    val nTok = Portable.nTokensSql("text")
    val nTypes = "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)"
    s"""SELECT doc_id, $nTok AS n_tokens, $nTypes AS n_types,
      |  CAST($nTypes AS DOUBLE) / $nTok AS ttr,
      |  CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok AS avg_token_len,
      |  0.5 * least(1.0, CAST($nTok AS DOUBLE) / 100.0)
      |    + 0.5 * (CAST($nTypes AS DOUBLE) / $nTok) AS quality_score
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- E3
  /** Token counting: whitespace tokens plus a BPE-ish subword estimate
    * (ceil(chars/4) — the classic ~4-chars-per-token rule). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val nTok = Portable.nTokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_text"),
        ceil(length(col("text")) / lit(4.0)).cast("long").as("est_bpe_tokens"),
        (length(col("text")).cast("double") / nTok).as("chars_per_token"))
      .orderBy("doc_id")
  }

  val tokenCountsSql: String = {
    val nTok = Portable.nTokensSql("text")
    s"""SELECT doc_id, $nTok AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_text,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
      |  CAST(length(text) AS DOUBLE) / $nTok AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- E4
  /** Fingerprints: full-content md5, 64-bit prefix, first-8-token
    * prefix hash, and the order-normalized bag signature. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(col("text")).as("fp_md5"),
        substring(md5(col("text")), 1, 16).as("fp64"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))).as("fp_prefix8"),
        Portable.bagSignature(col("text")).as("fp_bag"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    s"""SELECT doc_id, md5(text) AS fp_md5,
      |  substring(md5(text), 1, 16) AS fp64,
      |  md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp_prefix8,
      |  ${Portable.bagSignatureSql("text")} AS fp_bag
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- H2
  /** Internal-repetition quality signal (the Gopher/RefinedWeb-style
    * repetition filters): per doc, the fraction of duplicate 2-grams
    * and 3-grams — `1 - distinct/total`, computed as int-derived
    * double division so both engines produce identical bits. A doc
    * whose 3-gram duplicate fraction exceeds 0.2 is flagged. Narrow
    * per-row built-ins, zero shuffle — 100 TB is just more
    * partitions. */
  private val RepFlagThreshold = 0.2

  private def gramsSql(n: Int): String =
    s"list_transform(range(1, greatest(len(string_split(text, ' ')) - ${n - 1}, 1) + 1), " +
      s"i -> array_to_string(string_split(text, ' ')[i:i+${n - 1}], ' '))"

  def repetition(spark: SparkSession, dir: String): DataFrame = {
    // native fused [total, distinct] gram counts per n
    // (graft.plans.GramStats): one byte-span pass per row per n, no
    // gram array materialized, no interpreted lambda — bit-identical
    // counts to the size/array_distinct-over-transform chain it
    // replaces (the SQL twin below is unchanged). Re-evaluation by
    // CollapseProject is harmless now: each eval is a single fused
    // pass, not |grams| interpreted lambda calls.
    def repCols(n: Int): Seq[Column] = {
      val total = element_at(col(s"s$n"), 1)
      val dist = element_at(col(s"s$n"), 2)
      Seq(total.as(s"n${n}_total"), dist.as(s"n${n}_distinct"),
        ((total - dist).cast("double") / total.cast("double")).as(s"rep$n"))
    }
    val rep3 = (element_at(col("s3"), 1) - element_at(col("s3"), 2))
      .cast("double") / element_at(col("s3"), 1).cast("double")
    // parallelized: per-row byte scans are still the dominant cost and
    // the sf parquet can be a single split; the round-robin exchange
    // moves only (doc_id, text)
    Tables.parallelized(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        Vectors.gramStatsFast(spark, col("text"), 2).as("s2"),
        Vectors.gramStatsFast(spark, col("text"), 3).as("s3"))
      .select(col("doc_id") +: (repCols(2) ++ repCols(3))
        :+ (rep3 > RepFlagThreshold).as("is_repetitive"): _*)
      .orderBy("doc_id")
  }

  val repetitionSql: String = {
    def repCols(n: Int): String = {
      val total = s"CAST(len(${gramsSql(n)}) AS BIGINT)"
      val dist = s"CAST(len(list_distinct(${gramsSql(n)})) AS BIGINT)"
      s"""$total AS n${n}_total, $dist AS n${n}_distinct,
        |  CAST($total - $dist AS DOUBLE) / CAST($total AS DOUBLE) AS rep$n""".stripMargin
    }
    val total3 = s"CAST(len(${gramsSql(3)}) AS BIGINT)"
    val dist3 = s"CAST(len(list_distinct(${gramsSql(3)})) AS BIGINT)"
    s"""SELECT doc_id, ${repCols(2)}, ${repCols(3)},
      |  CAST($total3 - $dist3 AS DOUBLE) / CAST($total3 AS DOUBLE)
      |    > $RepFlagThreshold AS is_repetitive
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- H3
  /** Content scrubbing: PII regex redaction (emails, dashed phone
    * numbers) plus term-blocklist masking — the cleaning pass a
    * training corpus gets before tokenization. Patterns use only
    * RE2-safe syntax (character classes, no lookaround) so Spark's
    * java.util.regex and DuckDB's RE2 agree; blocklist masking is
    * token-level (split → CASE → re-join), which, unlike a substring
    * replace over padded text, handles ADJACENT blocked tokens and is
    * expressible identically in both engines. Narrow, zero shuffle. */
  val blockTerms: Seq[String] = Seq("slow", "big")
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

  def scrub(spark: SparkSession, dir: String): DataFrame = {
    // patterns go through the Column API as literals — never through a
    // SQL string literal, whose backslash-escape handling differs
    // between engines
    val redacted = regexp_replace(
      regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))
    val masked = concat_ws(" ",
      transform(split(redacted, " "),
        t => when(t.isInCollection(blockTerms), "<TERM>").otherwise(t)))
    Tables.parallelized(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long")
          .as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long")
          .as("n_phones"),
        size(filter(split(col("text"), " "), t => t.isInCollection(blockTerms)))
          .cast("long").as("n_blocked"),
        masked.as("clean_text"),
        (masked =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  val scrubSql: String = {
    val termList = blockTerms.map(t => s"'$t'").mkString(", ")
    val red = s"regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
      |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($termList))) AS BIGINT)
      |    AS n_blocked,
      |  array_to_string(list_transform(string_split($red, ' '),
      |    t -> CASE WHEN t IN ($termList) THEN '<TERM>' ELSE t END), ' ') AS clean_text,
      |  array_to_string(list_transform(string_split($red, ' '),
      |    t -> CASE WHEN t IN ($termList) THEN '<TERM>' ELSE t END), ' ') <> text AS changed
      |FROM documents ORDER BY doc_id""".stripMargin
  }
}
