package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII handling for training-data pipelines (SURVEY.md §2.4 extension
  * set): pattern redaction and deterministic pseudonymization.
  *
  * Both operators are pure map work built from codegen'd built-ins
  * (regexp_replace / regexp_count / the md5-derived portable hash) — no
  * UDFs, no shuffle, and the whole pass stays inside WholeStageCodegen, so
  * a 100 TB redaction sweep is a single scan.
  *
  * Pattern notes: keep regexes inside the syntax subset shared by Java's
  * regex engine (Spark) and RE2 (DuckDB, for the oracle): character
  * classes, bounded repetition, alternation — no backreferences or
  * lookaround (RE2 has neither). Spark's regexp_replace replaces ALL
  * matches; the DuckDB equivalent needs the 'g' flag.
  */
object Privacy {

  /** Digit runs of 3+ — numeric identifiers (account numbers, phone
    * fragments, ids embedded in names/free text). */
  val NumericIdPattern = "[0-9]{3,}"

  /** Email addresses, RE2-safe subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Replace every match of `pattern` with `replacement`. */
  def redact(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, pattern, replacement)

  /** Number of matches redaction would hit (the audit metric a redaction
    * sweep reports per record). Cast long: Spark counts in int32, the
    * oracle's len() is int64. */
  def redactionCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast("long")

  /** Deterministic pseudonym for an identifier: the portable 60-bit
    * content hash. Same id ⇒ same pseudonym across runs, engines and
    * partitionings (so joins on pseudonymized keys still work), while the
    * raw id never leaves the scan. For real deployments compose a secret
    * salt into the input; the mechanics are identical. */
  def pseudonymize(c: Column): Column = Sampling.portableHash(c)

  /** Per-record redaction audit over a free-text column: pseudonymized
    * key, redacted text, hit count. */
  def redactionAudit(df: DataFrame, idCol: String, textCol: String,
      pattern: String, replacement: String): DataFrame =
    df.select(
      col(idCol),
      pseudonymize(col(idCol)).as("pseudo_id"),
      redact(col(textCol), pattern, replacement).as("redacted"),
      redactionCount(col(textCol), pattern).as("n_hits"))
}
