package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/hash primitives built ONLY from engine-portable operations
  * (length/replace/split/md5/integer arithmetic) so the DuckDB oracle
  * reproduces results bit-for-bit. Every helper has a `...Sql` twin
  * generating the equivalent DuckDB SQL fragment from the same
  * parameters — one source of truth for both engines.
  *
  * All are codegen'd built-ins (no UDFs): they stay inside
  * WholeStageCodegen and never leave the JVM hot path.
  */
object Portable {

  // ---------------------------------------------------- zone-free time
  /** Zone-free instant literal for a UTC wall-clock string ("yyyy-MM-dd
    * [HH:mm:ss]"): parsed driver-side AS UTC and emitted through
    * `timestamp_micros`, so the session timezone cannot shift it. A
    * `lit(str).cast("timestamp")` parses in the SESSION zone — in a
    * non-UTC consumer session every such boundary literal moves by the
    * zone offset relative to the oracle's naive-UTC read, flipping
    * midnight-aligned rows across <=/< filters (TPC-H date predicates
    * are exactly that shape). */
  def utcTs(iso: String): Column = {
    val s = iso.replace(' ', 'T')
    val ldt = java.time.LocalDateTime.parse(
      if (s.contains("T")) s else s + "T00:00:00")
    timestamp_micros(lit(
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L))
  }

  /** UTC calendar date of a µs-since-epoch instant, derived
    * arithmetically (`to_date` on a timestamp renders in the session
    * zone). pmod keeps the floor exact for pre-epoch instants. */
  def utcDateOfMicros(us: Column): Column =
    date_add(to_date(lit("1970-01-01")),
      ((us - pmod(us, lit(86400000000L))) / lit(86400000000L)).cast("int"))

  /** UTC hour-truncation of a µs instant, arithmetic — `date_trunc`
    * truncates in the session zone, which diverges from UTC in
    * non-whole-hour-offset zones (e.g. +05:45). */
  def utcHourTruncMicros(us: Column): Column =
    timestamp_micros(us - pmod(us, lit(3600000000L)))

  /** Scalar JSON string-field extraction on the VARIANT fast path.
    * `get_json_object` builds a Jackson parser plus a charset-decoder
    * stream PER ROW — measured 41.7 s vs 4.9 s over the same 10M-row
    * groupBy (100× corpus, quiet host, BASELINE round-10 findings) —
    * while `try_parse_json` + `variant_get` is a codegen'd binary
    * parse with the same null-on-malformed / null-on-missing
    * semantics. SCALAR fields only: variant RE-SERIALIZES objects and
    * arrays (spacing differs from the original text span), so
    * object-valued extraction (A14's `detail_raw`) stays on
    * `get_json_object`. The DuckDB twin is unchanged
    * (`json_extract_string` — already a fast path there). */
  def jsonGetString(j: Column, path: String): Column =
    variant_get(try_parse_json(j), path, "string")

  /** Non-overlapping substring occurrence count via length-difference.
    * Left-to-right non-overlapping on both engines — deterministic. */
  def countSubstr(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / pat.length).cast("long")

  def countSubstrSql(c: String, pat: String): String =
    s"CAST((length($c) - length(replace($c, '$pat', ''))) / ${pat.length} AS BIGINT)"

  /** ' '||text||' ' so word-boundary patterns match at string edges. */
  def padded(c: Column): Column = concat(lit(" "), c, lit(" "))
  def paddedSql(c: String): String = s"(' ' || $c || ' ')"

  /** Whitespace token count (single-spaced, trimmed input). */
  def nTokens(text: Column): Column = countSubstr(text, " ") + 1
  def nTokensSql(text: String): String = s"(${countSubstrSql(text, " ")} + 1)"

  /** Sorted-distinct-token signature: normalizes word order away, so
    * bag-equality collapses to string equality. */
  def bagSignature(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(text, " ")))))
  def bagSignatureSql(text: String): String =
    s"md5(array_to_string(list_sort(list_distinct(string_split($text, ' '))), ' '))"

  /** Strict integer-string cast: only pure integer strings of ≤9
    * digits (always fits INT32) survive; everything else is NULL.
    * Needed because the engines' lenient casts disagree — Spark
    * try_cast('3.5' AS INT) is NULL while DuckDB TRY_CAST rounds to 4.
    * The shared regexp makes the kept-row set identical.
    *
    * KNOWN DEVIATION (deliberate): 10-digit INT32 strings such as
    * '2000000000' and leading-zero forms like '0000000123' are
    * rejected, where a Go-style strconv.Atoi would accept them. A
    * width check is engine-portable; a value-range check is not
    * (DuckDB CAST errors on overflow where Spark try_cast nulls), so
    * the ≤9-digit rule is the widest form both engines evaluate
    * identically. The generator's props values are ≤6 digits. */
  val IntStrictRe = "^-?[0-9]{1,9}$"
  def intStrict(c: Column): Column =
    when(c.rlike(IntStrictRe), c).cast("int")
  def intStrictSql(c: String): String =
    s"(CASE WHEN regexp_matches($c, '$IntStrictRe') THEN CAST($c AS INT) END)"

  /** Two hex digits at 1-based position p of a lowercase hex string,
    * as an INT in 0..255. Spark has conv(); DuckDB has no base
    * conversion, so the twin uses positional strpos arithmetic. */
  def hexPairToInt(c: Column, p: Int): Column =
    conv(substring(c, p, 2), 16, 10).cast("int")
  def hexPairToIntSql(c: String, p: Int): String =
    s"CAST((strpos('0123456789abcdef', substring($c, $p, 1)) - 1) * 16" +
      s" + strpos('0123456789abcdef', substring($c, ${p + 1}, 1)) - 1 AS INT)"

  /** Sum of word-boundary hits for a stopword set over padded text. */
  def stopwordHits(p: Column, words: Seq[String]): Column =
    words.map(w => countSubstr(p, s" $w ")).reduce(_ + _)
  def stopwordHitsSql(p: String, words: Seq[String]): String =
    words.map(w => countSubstrSql(p, s" $w ")).mkString("(", " + ", ")")
}
