package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming training-data ops: the ingest-side counterparts of the batch
  * `graft.ops` family, built on Structured Streaming's bounded-state
  * operators. A live corpus ingest (crawler output, transcript firehose)
  * wants exact dedup AT ingest so duplicates never reach the batch curation
  * passes; its state must be bounded by a time horizon or a long-lived
  * stream grows state with corpus size (the ADVICE-r04 class of leak).
  */
object StreamingOps {

  /** Streaming exact dedup for corpus ingestion: drop documents whose
    * CONTENT (md5 of the text — the same 128-bit key the batch
    * [[graft.ops.Dedup.exact]] groups on; a 30-bit poly-hash key would
    * birthday-collide and silently drop distinct documents at corpus
    * scale) was already seen within `watermarkDelay` of the stream's event
    * time. Built on `dropDuplicatesWithinWatermark`, so the key state is
    * BOUNDED by the horizon: a duplicate arriving after its key's state
    * expired is emitted again — the standard bounded-state trade, sized by
    * the caller to the ingest's realistic duplicate window (crawl recrawls
    * cluster in time; cross-epoch dedup belongs to the batch curation
    * pass). The unbounded `dropDuplicates` variant is deliberately NOT
    * used: its state grows forever on a long-lived stream.
    *
    * State survives restarts via the checkpoint (a duplicate arriving in a
    * later run, within the horizon, is still dropped — tested), and the
    * parquet file sink's `_spark_metadata` transaction log makes the
    * output exactly-once across query restarts.
    *
    * Scale shape: the dedup operator hash-partitions the stream by the
    * content key — one shuffle; state is (key → seen) per partition, no
    * driver state anywhere.
    */
  def dedupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      outPath: String,
      queryName: String,
      checkpointDir: String,
      watermarkDelay: String = "10 minutes"): StreamingQuery =
    docs
      .withColumn("_fp", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .outputMode("append")
      .start()
}
