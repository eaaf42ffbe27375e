package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables. Hash-free formulations carry DuckDB oracles; hash-based LSH /
  * float-ranked ANN are rows-only here and verified against in-engine
  * brute-force oracles in OpsSpec.
  */
object OpsQueries {
  import CoreQueries.tbl

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(tbl(s, d, "documents"), "doc_id", "text")

  /** Near-dup pairs by unigram Jaccard on a 2% document sample (the shared
    * synthetic vocabulary makes the full corpus degenerate-dense; the
    * inverted-index shape is the same).
    */
  def dedupJaccardPairs(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(
      tbl(s, d, "documents").filter(pmod(col("doc_id"), lit(50)) === 0),
      "doc_id", "text", thresholdPct = 80, maxDf = 1000000L)

  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(
      tbl(s, d, "documents").filter(pmod(col("doc_id"), lit(20)) === 0),
      "doc_id", "text", numHashes = 32, bands = 8, thresholdPct = 80)

  /** The 100-TB-capped minhash shape with BOTH caps live (df cap 50,
    * bucket cap 5) — caps are exact SQL (GROUP BY … HAVING), so the capped
    * run is oracle-checked end to end, not just plan-asserted.
    */
  def dedupMinhashCapped(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(
      tbl(s, d, "documents").filter(pmod(col("doc_id"), lit(20)) === 0),
      "doc_id", "text", numHashes = 32, bands = 8, thresholdPct = 80,
      maxDf = 50L, maxBucket = 5L)

  /** Near-dup clusters over the same sample as [[dedupMinhashLsh]]:
    * CAPPED-BY-DEFAULT pairs (df cap greatest(100, corpus/100), bucket cap
    * 1000 — the entry point routes through the tracked capped dedup) →
    * connected components → (doc_id, rep_id). The oracle reproduces the
    * caps as HAVING clauses and closes the pair set with a recursive CTE,
    * so the composition (capped LSH × union-find) is driver-verified end
    * to end.
    */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.minhashClusters(
      tbl(s, d, "documents").filter(pmod(col("doc_id"), lit(20)) === 0),
      "doc_id", "text", numHashes = 32, bands = 8, thresholdPct = 80)

  /** Full curation composition on the same sample: quality gate (≥900
    * drops stopword-free docs) → capped cluster dedup (same 100-TB
    * defaults as [[dedupClusters]], caps reproduced in the oracle) →
    * deterministic split.
    */
  def curateCorpus(s: SparkSession, d: String): DataFrame =
    graft.ops.Curate.curate(
      tbl(s, d, "documents").filter(pmod(col("doc_id"), lit(20)) === 0),
      "doc_id", "text", minQualityMilli = 900, thresholdPct = 80)

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(
      tbl(s, d, "documents").filter(pmod(col("doc_id"), lit(20)) === 0),
      "doc_id", "text", maxHamming = 3, chunks = 4)

  def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.quality(tbl(s, d, "documents"), "doc_id", "text")

  def langId(s: SparkSession, d: String): DataFrame =
    TextAnalysis.langId(tbl(s, d, "documents"), "doc_id", "text")

  def tokenCounts(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCounts(tbl(s, d, "documents"), "doc_id", "text")

  def docFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprints(tbl(s, d, "documents"), "doc_id", "text")

  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.attach(tbl(s, d, "documents"), "doc_id", "text")
      .select("media_id", "mime", "n_bytes")

  /** Binary frame-sampling plumbing; per-media sampled-frame stats. */
  def frameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.attach(tbl(s, d, "documents"), "doc_id", "text"),
      frameBytes = 32, stride = 2)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"), sum(col("frame_bytes")).as("total_bytes"))

  /** Real codec path: text rendered as binary PGM images, decoded back by
    * header parse + pixel statistics — integer-exact, DuckDB-oracled.
    */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeFeatures(
      Multimodal.attachPgm(tbl(s, d, "documents"), "doc_id", "text"),
      Multimodal.PgmCodec)
      .toDF().select("media_id", "n_bytes", "width", "height", "pixel_sum", "mean_milli")

  /** Second real codec path: text rendered as 8-bit grayscale BMP (binary
    * little-endian header built via unhex), decoded back by header parse +
    * stride-aware raster fold — integer-exact, DuckDB-oracled.
    */
  def multimodalBmp(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeFeatures(
      Multimodal.attachBmp(tbl(s, d, "documents"), "doc_id", "text"),
      Multimodal.BmpCodec)
      .toDF().select("media_id", "n_bytes", "width", "height", "pixel_sum", "mean_milli")

  def embedStats(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "embeddings").groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(size(col("embedding"))).as("min_dim"),
        max(size(col("embedding"))).as("max_dim"))

  /** Brute-force cosine top-k on a 5% sample (exact ANN baseline;
    * integer-quantized ranking — DuckDB-oracled).
    */
  def annBruteTopK(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(
      tbl(s, d, "embeddings").filter(pmod(col("vec_id"), lit(20)) === 0),
      "vec_id", "embedding", k = 5)

  /** IVF ANN on the same sample: trained √N centroids, 2 Lloyd rounds,
    * 3-probe — the scale path, reproduced step-for-step by the DuckDB oracle.
    */
  def annIvfTopK(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(
      tbl(s, d, "embeddings").filter(pmod(col("vec_id"), lit(20)) === 0),
      "vec_id", "embedding", k = 5, nCentroids = 0, nProbe = 3)

  def embedNearDups(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingNearDups(
      tbl(s, d, "embeddings").filter(pmod(col("vec_id"), lit(5)) === 0),
      "vec_id", "embedding", thresholdPct = 15, nPlanes = 4)
      .select(col("a"), col("b"))
}
