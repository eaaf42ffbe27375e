package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination — flag training documents that share word
  * n-grams with an evaluation set (the GPT-3 appendix-C / Gopher-style
  * overlap check: a benchmark answer leaking into pretraining data inflates
  * eval scores, so contaminated documents are dropped or audited).
  *
  * Shingles are poly-hashed n-gram strings (engine-portable, the same
  * primitive as the dedup family), so the whole operator carries an exact
  * DuckDB oracle.
  *
  * Scale shape: both sides reduce to distinct (id, shingle_hash) inverted
  * indices joined on the hash — never a doc×doc comparison. The eval side
  * of a real run is millions of times smaller than the corpus, so Catalyst
  * broadcasts it; the df cap on eval shingles (ON by default) drops
  * boilerplate n-grams that would otherwise flag most of the corpus and
  * blow up the join fan-out.
  */
object Decontam {

  /** Array of poly-hashes of the document's word n-grams (empty when the
    * document has fewer than n tokens). One fused codegen pass
    * ([[graft.functions.ShingleHashes]]); equivalence with the
    * HOF formulation — and therefore with the DuckDB oracle that mirrors
    * it — is property-tested in PolyHashSpec.
    */
  def shingleHashes(textCol: Column, n: Int): Column =
    graft.functions.ShingleHashes.shingle_hashes(textCol, n)

  /** Per-doc DISTINCT shingle array — deduped LOCALLY via `array_distinct`
    * on the already-arrayed shingles. The `explode(...).distinct()`
    * alternative exchanges the full (id, shingle) volume — roughly one row
    * per corpus token — which was the operator's dominant shuffle; a doc's
    * shingles all live in its own row, so per-doc dedupe needs no exchange
    * at all.
    */
  private def docShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      array_distinct(shingleHashes(col(textCol), n)).as("arr"))

  /** Per-corpus-document contamination against `evalDf`: documents sharing
    * at least one (df-capped) eval shingle, with the shingle counts and the
    * contamination ratio in integer per-mille.
    *
    * Corpus-side plan: project shingle arrays → explode → broadcast left
    * join → one hash aggregation. The only corpus exchange is the final
    * groupBy, and since every doc's shingles sit in one input partition the
    * map-side combine reduces it to ~one row per document before it moves.
    *
    * @param maxEvalDf drop eval shingles present in more than this many
    *                  eval documents (boilerplate cap — the exact-SQL
    *                  `HAVING count(*) <= maxEvalDf` shape)
    * @return (idCol, n_shingles, n_shared, contam_milli)
    */
  def overlap(corpus: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 5, maxEvalDf: Long = 1000L): DataFrame = {
    val evalShingles = docShingles(evalDf, idCol, textCol, n)
      .select(explode(col("arr")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("edf"))
      .filter(col("edf") <= maxEvalDf)
      .select("sh")
    // ONE pass over the corpus shingles: mark hits with a broadcast left
    // join, then count total + shared in the same aggregation (a semi join
    // + a separate per-doc total would evaluate the corpus-side explode
    // twice — 2× the dominant cost at corpus scale). The array is already
    // per-doc DISTINCT, so count(*) per id IS n_shingles — do NOT project
    // size(arr) beside the explode: CollapseProject inlines the array
    // definition into both, and the projection above the resulting Generate
    // re-evaluates the whole shingle computation per exploded row (measured
    // 27× = shingles/doc at sf0.1).
    docShingles(corpus, idCol, textCol, n)
      .select(col("id"), explode(col("arr")).as("sh"))
      .join(evalShingles.withColumn("hit", lit(1L)), Seq("sh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .filter(col("n_shared") > 0)
      .select(col("id").as(idCol), col("n_shingles"), col("n_shared"),
        expr("n_shared * 1000 div n_shingles").as("contam_milli"))
  }
}
