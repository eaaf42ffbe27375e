package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental KG append over a transcript STREAM.
  *
  * The reference is pure batch (SURVEY.md §2.7) and so is the north rule;
  * this is the optional incremental-ingest extension: new transcript turns
  * arrive on a stream, mention detection + triple extraction run per
  * micro-batch against the (periodically rebuilt, broadcast) dictionaries,
  * and triples append to the KG tables. Canonicalization/link-score
  * re-aggregation stay batch jobs over the appended output — the classic
  * lambda split for fixpoint operators that streaming cannot express.
  *
  * Delivery: EFFECTIVELY-ONCE per micro-batch. Each batch writes to a
  * deterministic `batch=<batchId>` partition directory with overwrite — a
  * replayed/restarted micro-batch rewrites its own directory instead of
  * appending duplicates (foreachBatch alone is at-least-once; batch-keyed
  * idempotent writes are the standard upgrade). Within a batch,
  * dropDuplicates removes same-batch repeats; readers see the union of batch
  * directories (`spark.read.parquet(outPath)` — the batch key surfaces as a
  * partition column).
  */
object IncrementalKg {

  /** Wire a streaming transcripts source to an append sink of triples.
    * `transcripts` must be a streaming DataFrame with the input_hint schema.
    * `dictionary` is a BATCH dictionary (surface, id, kind, is_prop, weight).
    */
  def triplesStream(
      transcripts: DataFrame,
      dictionary: DataFrame,
      outPath: String,
      queryName: String,
      checkpointDir: String): StreamingQuery = {
    val withWm = transcripts.withWatermark("ts", "10 minutes")
    // per-batch: the same batch operators as the pipeline — mention scan is
    // stateless per turn, triple extraction windows stay WITHIN a batch
    // (conversations are assumed batch-aligned by the ingest partitioner;
    // a cross-batch conversation focus would need flatMapGroupsWithState).
    withWm.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val mentions = graft.pipeline.Mentions.detectFast(batch.toDF(), dictionary)
        graft.pipeline.Triples.extract(mentions)
          .dropDuplicates("conv_id", "turn_idx", "subj", "pred", "obj")
          // idempotent: replays of batch N overwrite batch N's own directory
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** Stateful streaming mention counts with watermarked event-time windows —
    * the windowed-aggregation shape (readStream → watermark → window → agg)
    * for monitoring link-score drift on the stream.
    */
  def mentionRates(transcripts: DataFrame, dictionary: DataFrame): DataFrame = {
    val withWm = transcripts.withWatermark("ts", "10 minutes")
    // stateless scan then windowed count by entity id
    val exploded = withWm
      .select(col("conv_id"), col("turn_idx"), col("text"), col("ts"))
      .withColumn("tok", explode(split(col("text"), "\\s+")))
    exploded
      .join(broadcast(dictionary.filter(!col("is_prop"))
        .filter(!col("surface").contains(" "))
        .select(col("surface").as("tok"), col("id"))), Seq("tok"))
      .groupBy(window(col("ts"), "5 minutes"), col("id"))
      .agg(count(lit(1)).as("n_mentions"))
  }
}
