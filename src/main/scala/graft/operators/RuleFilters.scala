package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables

/** Published rule-based document filters (V-series): the hand-written
  * heuristic gates every large public pretraining corpus ships with,
  * complementing the LEARNED quality models already in the suite (E2's
  * blended score, P2's trained classifier, O4/S2's LM perplexity).
  *
  * - V1 [[gopherRules]]: the Gopher repetition-free quality rule set
  *   (Rae et al. 2021, appendix A1.1) — word count, mean word length,
  *   symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic
  *   word fraction, required-stopword presence.
  * - V2 [[c4Clean]]: C4's line-level cleaning pass (Raffel et al.
  *   2020, §2.2) — terminal punctuation, minimum line words,
  *   lorem-ipsum / brace / "javascript" page-and-line rules.
  *
  * Scale shape: every rule is a narrow per-row expression over built-in
  * string/array functions — a single scan with no shuffle and no UDFs,
  * one WholeStageCodegen span; 100 TB is just more partitions. All
  * double ratios are derived from integer counts with the identical
  * operation order on both engines (IEEE-identical), so the DuckDB
  * oracle reproduces exact bits.
  */
object RuleFilters {

  /** Gopher's required "stop words" — a doc must contain at least
    * [[GopherMinStopwords]] distinct members (Rae et al. 2021 A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStopwords = 2

  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinWordLen = 3.0
  val GopherMaxWordLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMaxBulletFrac = 0.9
  val GopherMaxEllipsisFrac = 0.3
  val GopherMinAlphaFrac = 0.8

  // ---------------------------------------------------------------- V1
  /** Gopher rule report: per document, every rule's measured statistic,
    * its boolean verdict, and the conjunction (`pass`). Emitting the
    * full per-rule breakdown (not just the filter) is deliberate — at
    * corpus scale the distribution of failure REASONS is the tuning
    * signal, and M2's drop-provenance ledger can consume the flags. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesFrom(Tables.documents(spark, dir))

  def gopherRulesFrom(docs: DataFrame): DataFrame =
    gopherVerdicts(docs).orderBy("doc_id")

  /** Sort-free verdict projection — stateless per-row, so it is also
    * the STREAMING form: apply it to a readStream frame and each
    * arriving doc leaves with its rule verdicts in-flight (the same
    * columns, so stream and batch cannot diverge; pinned in
    * StreamingRuleGateSpec). */
  def gopherVerdicts(docs: DataFrame): DataFrame = {
    val text = col("text")
    val nWords = Portable.nTokens(text)
    val meanWordLen = (length(text) - nWords + 1).cast("double") / nWords
    val symRatio =
      (Portable.countSubstr(text, "#") + Portable.countSubstr(text, "..."))
        .cast("double") / nWords
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("double") / nLines
    val ellipsisFrac =
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nLines
    // a word is alphabetic iff case-mapping changes it — portable, no
    // regex-dialect dependence
    val alphaFrac = size(filter(split(text, " "), w => lower(w) =!= upper(w)))
      .cast("double") / nWords
    val p = Portable.padded(text)
    val nStop = GopherStopwords
      .map(w => when(Portable.countSubstr(p, s" $w ") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val rWords = nWords >= GopherMinWords && nWords <= GopherMaxWords
    val rWordLen =
      meanWordLen >= GopherMinWordLen && meanWordLen <= GopherMaxWordLen
    // Rae et al. 2021 (Gopher, A1.1) REMOVES docs with symbol ratio
    // GREATER than 0.1, so a doc exactly at the bound is kept: <=
    val rSymbol = symRatio <= GopherMaxSymbolRatio
    val rBullet = bulletFrac <= GopherMaxBulletFrac
    val rEllipsis = ellipsisFrac <= GopherMaxEllipsisFrac
    val rAlpha = alphaFrac >= GopherMinAlphaFrac
    val rStop = nStop >= GopherMinStopwords
    docs.select(col("doc_id"), nWords.as("n_words"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(symRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.as("n_stopwords"),
      rWords.as("r_words"), rWordLen.as("r_word_len"),
      rSymbol.as("r_symbol"), rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"),
      rStop.as("r_stopwords"),
      (rWords && rWordLen && rSymbol && rBullet && rEllipsis && rAlpha &&
        rStop).as("pass"))
  }

  val gopherRulesSql: String = {
    val nW = Portable.nTokensSql("text")
    val mwl = s"(CAST(length(text) - $nW + 1 AS DOUBLE) / $nW)"
    val sym = s"(CAST(${Portable.countSubstrSql("text", "#")} + " +
      s"${Portable.countSubstrSql("text", "...")} AS DOUBLE) / $nW)"
    val lines = "string_split(text, chr(10))"
    val nL = s"CAST(len($lines) AS BIGINT)"
    val bullet = s"(CAST(len(list_filter($lines, l -> starts_with(l, '- ')" +
      s" OR starts_with(l, '* ') OR starts_with(l, '• '))) AS DOUBLE)" +
      s" / $nL)"
    val ell = s"(CAST(len(list_filter($lines, l -> ends_with(l, '...')))" +
      s" AS DOUBLE) / $nL)"
    val alpha = "(CAST(len(list_filter(string_split(text, ' '), " +
      s"w -> lower(w) != upper(w))) AS DOUBLE) / $nW)"
    val p = Portable.paddedSql("text")
    val nStop = GopherStopwords
      .map(w => s"(CASE WHEN ${Portable.countSubstrSql(p, s" $w ")} > 0" +
        " THEN 1 ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")
    val rWords = s"(m.n_words >= $GopherMinWords AND " +
      s"m.n_words <= $GopherMaxWords)"
    val rWordLen = s"(m.mwl >= $GopherMinWordLen AND " +
      s"m.mwl <= $GopherMaxWordLen)"
    val rSymbol = s"(m.sym <= $GopherMaxSymbolRatio)"
    val rBullet = s"(m.bullet <= $GopherMaxBulletFrac)"
    val rEllipsis = s"(m.ell <= $GopherMaxEllipsisFrac)"
    val rAlpha = s"(m.alpha >= $GopherMinAlphaFrac)"
    val rStop = s"(m.n_stopwords >= $GopherMinStopwords)"
    s"""WITH m AS (
      |  SELECT doc_id, CAST($nW AS BIGINT) AS n_words, $mwl AS mwl,
      |    $sym AS sym, $bullet AS bullet, $ell AS ell, $alpha AS alpha,
      |    $nStop AS n_stopwords
      |  FROM documents)
      |SELECT m.doc_id, m.n_words,
      |  round(m.mwl, 6) AS mean_word_len,
      |  round(m.sym, 6) AS symbol_ratio,
      |  round(m.bullet, 6) AS bullet_frac,
      |  round(m.ell, 6) AS ellipsis_frac,
      |  round(m.alpha, 6) AS alpha_frac,
      |  m.n_stopwords,
      |  $rWords AS r_words, $rWordLen AS r_word_len,
      |  $rSymbol AS r_symbol, $rBullet AS r_bullet,
      |  $rEllipsis AS r_ellipsis, $rAlpha AS r_alpha,
      |  $rStop AS r_stopwords,
      |  ($rWords AND $rWordLen AND $rSymbol AND $rBullet AND $rEllipsis
      |   AND $rAlpha AND $rStop) AS pass
      |FROM m ORDER BY m.doc_id""".stripMargin
  }

  val C4MinLineWords = 5L
  val C4MinSentences = 3L

  // ---------------------------------------------------------------- V2
  /** C4 line-level cleaning (Raffel et al. 2020, §2.2): retain only
    * lines that end in terminal punctuation, carry ≥ 5 words, and don't
    * mention "javascript"; drop whole pages containing "lorem ipsum" or
    * a curly brace, or whose cleaned text has < 3 sentences. The
    * cleaned text itself rides the output as `cleaned_md5`, so the
    * TRANSFORM — not just its statistics — sits under the hash gate.
    * (C4's final step, three-sentence-span dedup, is S1's span-removal
    * operator; its dirty-word page list is H3's blocklist scrub — this
    * pass composes with both rather than re-implementing them.) */
  def c4Clean(spark: SparkSession, dir: String): DataFrame =
    c4CleanFrom(Tables.documents(spark, dir))

  def c4CleanFrom(docs: DataFrame): DataFrame =
    c4Verdicts(docs).orderBy("doc_id")

  /** Sort-free form — stateless per-row, streaming-safe (see
    * [[gopherVerdicts]]). */
  def c4Verdicts(docs: DataFrame): DataFrame = {
    val text = col("text")
    val lines = split(text, "\n")
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        Portable.nTokens(l) >= C4MinLineWords &&
        !lower(l).contains("javascript"))
    val cleaned = array_join(kept, "\n")
    val nSent = Portable.countSubstr(cleaned, ".") +
      Portable.countSubstr(cleaned, "!") + Portable.countSubstr(cleaned, "?")
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    docs.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept"),
      length(cleaned).cast("long").as("n_chars_kept"),
      nSent.as("n_sentences"),
      hasLorem.as("has_lorem"), hasBrace.as("has_brace"),
      (!hasLorem && !hasBrace && nSent >= C4MinSentences).as("page_kept"),
      md5(cleaned).as("cleaned_md5"))
  }

  // FineWeb custom-filter thresholds (Penedo et al. 2024, §3.6 "our
  // custom filters" — the three heuristics FineWeb added ON TOP of
  // Gopher+C4 after ablating them against RefinedWeb): a page is
  // removed when its fraction of lines ending in punctuation is
  // <= 0.12, OR its fraction of line characters inside duplicated
  // lines is >= 0.10, OR its fraction of lines shorter than 30 chars
  // is >= 0.67. Verdicts are evaluated as exact integer
  // cross-multiplications (the Gopher symRatio boundary lesson), so
  // no float rounding can flip a boundary doc.
  val FwPunctBarNum = 12    // keep iff punct_lines·100 > n_lines·12
  val FwDupBarNum = 1       // keep iff dup_chars·10  < tot_chars·1
  val FwShortBarNum = 67    // keep iff short_lines·100 < n_lines·67
  val FwShortLineChars = 30

  // ---------------------------------------------------------------- Z4
  /** FineWeb's three custom line-grain filters (Penedo et al. 2024) —
    * the heuristics that close the published filter canon after V1
    * (Gopher) and V2 (C4): terminal-punctuation line fraction,
    * duplicated-line character fraction (the MassiveText repetition
    * signal at line grain), and short-line fraction. Same contract as
    * V1: every statistic and per-rule verdict rides the output so the
    * failure-reason distribution is observable, and M2's ledger can
    * consume the flags.
    *
    * Scale shape: narrow per-row expressions only — the duplicated-line
    * count sorts each doc's OWN line array and counts chars in
    * consecutive equal runs (O(L log L), order-independent so each
    * engine may sort under its own collation), never a corpus-grain
    * line shuffle; total line chars fall out of length(text) minus the
    * newline count. One scan, one WholeStageCodegen span, no shuffle. */
  def fineWebFilters(spark: SparkSession, dir: String): DataFrame =
    fineWebFiltersFrom(Tables.documents(spark, dir))

  def fineWebFiltersFrom(docs: DataFrame): DataFrame =
    fineWebVerdicts(docs).orderBy("doc_id")

  /** Sort-free verdict projection — stateless per-row, streaming-safe
    * (see [[gopherVerdicts]]). */
  def fineWebVerdicts(docs: DataFrame): DataFrame = {
    val text = col("text")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val punctLines = size(filter(lines, l =>
      l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\""))).cast("long")
    val shortLines = size(filter(lines, l =>
      length(l) < FwShortLineChars)).cast("long")
    // chars on lines = all chars minus the (n_lines - 1) separators
    val totChars = (length(text).cast("long") - (nLines - 1)).as("tot")
    // sort a COPY of the line array; duplicates are then consecutive,
    // so chars-in-duplicated-occurrences is one indexed pass (the r16
    // no-struct-array_distinct discipline)
    // bind the sorted array ONCE as a lambda argument (the r14/r16
    // no-repeated-array-subexpressions-in-lambdas discipline — a bare
    // element_at(array_sort(...), i) would re-sort per element)
    val dupChars = expr(
      """aggregate(
        |  flatten(transform(array(array_sort(split(text, '\n'))),
        |    sv -> CASE WHEN size(sv) < 2 THEN array(0L)
        |      ELSE transform(sequence(1, size(sv) - 1),
        |        i -> CASE WHEN element_at(sv, i + 1) = element_at(sv, i)
        |          THEN CAST(length(element_at(sv, i + 1)) AS BIGINT)
        |          ELSE 0L END) END)),
        |  0L, (a, x) -> a + x)""".stripMargin)
    docs.select(col("doc_id"), nLines.as("n_lines"),
        punctLines.as("punct_lines"), shortLines.as("short_lines"),
        dupChars.as("dup_chars"), totChars.as("tot_chars"))
      .select(col("doc_id"), col("n_lines"), col("punct_lines"),
        col("short_lines"), col("dup_chars"), col("tot_chars"),
        round(col("punct_lines").cast("double") / col("n_lines"), 9)
          .as("punct_frac"),
        round(when(col("tot_chars") === 0, 0.0)
          .otherwise(col("dup_chars").cast("double") / col("tot_chars")), 9)
          .as("dup_frac"),
        round(col("short_lines").cast("double") / col("n_lines"), 9)
          .as("short_frac"),
        (col("punct_lines") * 100 > col("n_lines") * FwPunctBarNum)
          .as("ok_punct"),
        // tot_chars=0 (text of only newlines) has dup_frac 0.0, so the
        // verdict must agree with the reported statistic: vacuously ok
        (col("tot_chars") === 0 ||
          col("dup_chars") * 10 < col("tot_chars") * FwDupBarNum)
          .as("ok_dup"),
        (col("short_lines") * 100 < col("n_lines") * FwShortBarNum)
          .as("ok_short"))
      .withColumn("pass", col("ok_punct") && col("ok_dup") && col("ok_short"))
  }

  val fineWebFiltersSql: String = {
    val lines = "string_split(text, chr(10))"
    val sv = s"list_sort($lines)"
    val punct = s"CAST(len(list_filter($lines, l -> ends_with(l, '.') OR " +
      "ends_with(l, '!') OR ends_with(l, '?') OR ends_with(l, '\"'))) AS BIGINT)"
    val short = s"CAST(len(list_filter($lines, l -> " +
      s"length(l) < $FwShortLineChars)) AS BIGINT)"
    val dup = s"CAST(coalesce(list_sum(list_transform(" +
      s"range(2, len($lines) + 1), " +
      s"i -> CASE WHEN ($sv)[i] = ($sv)[i - 1] " +
      s"THEN CAST(length(($sv)[i]) AS BIGINT) ELSE 0 END)), 0) AS BIGINT)"
    s"""WITH m AS (
      |  SELECT doc_id,
      |    CAST(len($lines) AS BIGINT) AS n_lines,
      |    $punct AS punct_lines,
      |    $short AS short_lines,
      |    $dup AS dup_chars,
      |    CAST(length(text) - (len($lines) - 1) AS BIGINT) AS tot_chars
      |  FROM documents)
      |SELECT doc_id, n_lines, punct_lines, short_lines, dup_chars, tot_chars,
      |  round(CAST(punct_lines AS DOUBLE) / n_lines, 9) AS punct_frac,
      |  round(CASE WHEN tot_chars = 0 THEN 0.0
      |    ELSE CAST(dup_chars AS DOUBLE) / tot_chars END, 9) AS dup_frac,
      |  round(CAST(short_lines AS DOUBLE) / n_lines, 9) AS short_frac,
      |  punct_lines * 100 > n_lines * $FwPunctBarNum AS ok_punct,
      |  (tot_chars = 0 OR dup_chars * 10 < tot_chars * $FwDupBarNum) AS ok_dup,
      |  short_lines * 100 < n_lines * $FwShortBarNum AS ok_short,
      |  (punct_lines * 100 > n_lines * $FwPunctBarNum AND
      |   (tot_chars = 0 OR dup_chars * 10 < tot_chars * $FwDupBarNum) AND
      |   short_lines * 100 < n_lines * $FwShortBarNum) AS pass
      |FROM m ORDER BY doc_id""".stripMargin
  }

  val c4CleanSql: String = {
    val lines = "string_split(text, chr(10))"
    val lineW = Portable.nTokensSql("l")
    val kept = s"list_filter($lines, l -> (ends_with(l, '.') OR " +
      "ends_with(l, '!') OR ends_with(l, '?') OR ends_with(l, '\"')) " +
      s"AND $lineW >= $C4MinLineWords " +
      "AND NOT contains(lower(l), 'javascript'))"
    val nSent = s"(${Portable.countSubstrSql("m.cleaned", ".")} + " +
      s"${Portable.countSubstrSql("m.cleaned", "!")} + " +
      s"${Portable.countSubstrSql("m.cleaned", "?")})"
    s"""WITH m AS (
      |  SELECT doc_id,
      |    CAST(len($lines) AS BIGINT) AS n_lines,
      |    CAST(len($kept) AS BIGINT) AS n_lines_kept,
      |    coalesce(array_to_string($kept, chr(10)), '') AS cleaned,
      |    contains(lower(text), 'lorem ipsum') AS has_lorem,
      |    contains(text, '{') AS has_brace
      |  FROM documents)
      |SELECT m.doc_id, m.n_lines, m.n_lines_kept,
      |  CAST(length(m.cleaned) AS BIGINT) AS n_chars_kept,
      |  $nSent AS n_sentences,
      |  m.has_lorem, m.has_brace,
      |  (NOT m.has_lorem AND NOT m.has_brace AND $nSent >= $C4MinSentences)
      |    AS page_kept,
      |  md5(m.cleaned) AS cleaned_md5
      |FROM m ORDER BY m.doc_id""".stripMargin
  }
}
