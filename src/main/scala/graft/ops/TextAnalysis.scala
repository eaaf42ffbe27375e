package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-vote heuristic), quality scoring, token counting, document
  * fingerprinting. Deliberately integer-only outputs so any ANSI SQL engine
  * reproduces them exactly (the DuckDB oracle path).
  */
object TextAnalysis {

  val enStop: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val deStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit")
  val frStop: Seq[String] = Seq("le", "la", "et", "de", "un", "est", "que", "pour")

  private def toks(c: Column): Column = filter(split(c, " "), t => length(t) > 0)

  private def stopHits(c: Column, stops: Seq[String]): Column =
    size(filter(toks(c), t => t.isin(stops.map(lit): _*)))

  /** Quality features + integer quality score (per-mille):
    * score = 400*alpha_ratio + 300*(1 - punct_ratio) + 300*stopword-presence,
    * all in integer arithmetic over character/token counts.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      size(toks(t)).cast("long").as("n_tokens"),
      (length(t) - length(regexp_replace(t, "[a-zA-Z]", ""))).cast("long").as("n_alpha"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long").as("n_digit"),
      (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).cast("long").as("n_punct"),
      stopHits(t, enStop).cast("long").as("n_stop"))
      .withColumn("quality_milli",
        when(col("n_chars") === 0, 0L).otherwise(
          // integer division throughout — bit-stable across SQL engines
          expr("n_alpha * 400 div n_chars") +
            expr("(n_chars - n_punct) * 300 div n_chars") +
            when(col("n_stop") > 0, 300L).otherwise(0L)))
  }

  /** Language-ID heuristic: stopword votes per language; argmax with
    * deterministic tie order en > de > fr; 'und' when no stopword hits.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      stopHits(t, enStop).cast("long").as("en_hits"),
      stopHits(t, deStop).cast("long").as("de_hits"),
      stopHits(t, frStop).cast("long").as("fr_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") > 0, "en")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") > 0, "de")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("und"))
  }

  /** Token counting: whitespace tokens + a BPE-ish sub-token count via the
    * regex `[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]` (RE2- and Java-regex
    * compatible).
    */
  val bpePattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(toks(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(bpePattern), lit(0))).cast("long")
        .as("bpe_tokens"))

  /** Polynomial rolling-hash fingerprint over characters, mod 1e9+7 —
    * deterministic across engines (integer-only). Backed by the native
    * codegen'd [[graft.functions.PolyHash]] expression (one fused loop); the
    * built-in formulation below is kept for equivalence testing and as the
    * documentation of the exact cross-engine semantics.
    */
  def fingerprint(textCol: Column): Column =
    graft.functions.PolyHash.poly_hash(textCol)

  /** Built-in-only reference formulation of [[fingerprint]] — what the
    * DuckDB oracles mirror term for term.
    */
  def fingerprintBuiltin(textCol: Column): Column =
    aggregate(
      filter(split(textCol, ""), c => length(c) > 0),
      lit(0L),
      (acc, c) => pmod(acc * 31 + ascii(c), lit(1000000007L)))

  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
}
