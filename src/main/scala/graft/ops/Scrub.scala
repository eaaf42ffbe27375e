package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before text ships (the C4/Gopher-style rule family:
  * pattern-match emails, IPv4 addresses and phone-shaped numbers, count
  * them, and replace each with a typed placeholder).
  *
  * The patterns use only constructs with identical semantics in Java regex
  * (Spark codegen'd `regexp_replace`/`regexp_extract_all`) and RE2 (the
  * DuckDB oracle): character classes, bounded quantifiers, literal dots —
  * no backreferences, no lookaround. Redaction order is fixed
  * (email → ipv4 → phone) so overlapping matches resolve identically in
  * every engine.
  *
  * Scale shape: per-row regex only — a map stage with no shuffle; the regex
  * runs inside whole-stage codegen with the Pattern compiled once per
  * operator instance.
  */
object Scrub {

  /** local-part@domain.tld — `-` placed last in each class (literal in both
    * Java regex and RE2).
    */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, matching the
    * common scrubber behavior of over-redacting rather than leaking).
    */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** NNN-NNNN phone shape. */
  val phonePattern = "[0-9]{3}-[0-9]{4}"

  private def countMatches(c: Column, pat: String): Column =
    size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")

  /** Redacted text: placeholders substituted in the fixed order
    * email → ipv4 → phone.
    */
  def redact(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Per-document PII counts + the redacted text. */
  def pii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      countMatches(t, emailPattern).as("n_emails"),
      countMatches(t, ipv4Pattern).as("n_ipv4"),
      countMatches(t, phonePattern).as("n_phones"),
      redact(t).as("redacted"))
  }

  /** [[pii]] with the redacted text folded to its engine-portable
    * fingerprint — the compact audit shape (proves the redacted BYTES are
    * identical across engines without carrying full text through the
    * comparison).
    */
  def piiAudit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    pii(df, idCol, textCol)
      .select(col(idCol), col("n_emails"), col("n_ipv4"), col("n_phones"),
        TextAnalysis.fingerprint(col("redacted")).as("redacted_fp"))
}
