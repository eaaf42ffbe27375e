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
    * document has fewer than n tokens).
    */
  def shingleHashes(textCol: Column, n: Int): Column = {
    val toks = filter(split(textCol, "\\s+"), t => length(t) > 0)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => TextAnalysis.fingerprint(concat_ws(" ", slice(toks, i, lit(n)))))
    ).otherwise(array().cast("array<long>"))
  }

  private def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), n)).as("sh"))
      .distinct()

  /** Per-corpus-document contamination against `evalDf`: documents sharing
    * at least one (df-capped) eval shingle, with the shingle counts and the
    * contamination ratio in integer per-mille.
    *
    * @param maxEvalDf drop eval shingles present in more than this many
    *                  eval documents (boilerplate cap — the exact-SQL
    *                  `HAVING count(*) <= maxEvalDf` shape)
    * @return (idCol, n_shingles, n_shared, contam_milli)
    */
  def overlap(corpus: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 5, maxEvalDf: Long = 1000L): DataFrame = {
    val corpusIdx = shingleIndex(corpus, idCol, textCol, n)
    val evalIdx = shingleIndex(evalDf, idCol, textCol, n)
    val evalShingles = evalIdx.groupBy("sh").agg(count(lit(1)).as("edf"))
      .filter(col("edf") <= maxEvalDf)
      .select("sh")
    // ONE pass over the corpus shingles: mark hits with a broadcast left
    // join, then count total + shared in the same aggregation (a semi join
    // + a separate per-doc total would evaluate the corpus-side explode
    // twice — 2× the dominant cost at corpus scale)
    corpusIdx.join(evalShingles.withColumn("hit", lit(1L)), Seq("sh"), "left")
      .groupBy("id").agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .filter(col("n_shared") > 0)
      .select(col("id").as(idCol), col("n_shingles"), col("n_shared"),
        expr("n_shared * 1000 div n_shingles").as("contam_milli"))
  }
}
