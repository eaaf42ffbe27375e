package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** The cross-batch conversation state: the focus entity the batch walker
  * carries between turns, persisted in the state store between micro-batches.
  */
final case class ConvFocus(lastEnt: String, lastScore: Double)

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
    // for conversations that SPLIT across batches use
    // [[statefulTriplesStream]], which carries the focus entity in a
    // flatMapGroupsWithState state store).
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

  /** Cross-batch stateful triple extraction (VERDICT r02 next-step #8):
    * unlike [[triplesStream]], conversations may SPLIT across micro-batches —
    * the conversation-focus entity (the batch walker's carried state) lives
    * in a `flatMapGroupsWithState` state store keyed by conv_id, so a
    * property mention in batch N+1 resolves its subject from an entity
    * mention seen in batch N, exactly as the batch pipeline would. Output is
    * byte-identical to `Triples.extract` over the concatenated batches,
    * PROVIDED turns arrive in conversation order across batches (the
    * append-log contract: a turn is the atomic ingest unit and later turns
    * land in later batches — the same assumption the batch window sort
    * encodes as ORDER BY turn_idx).
    *
    * Sink: the parquet file sink (exactly-once via its `_spark_metadata`
    * transaction log), not foreachBatch — state + sink both recover from the
    * checkpoint after a restart.
    */
  def statefulTriplesStream(
      transcripts: DataFrame,
      dictionary: DataFrame,
      outPath: String,
      queryName: String,
      checkpointDir: String): StreamingQuery = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    // stateless per-turn mention scan (broadcast trie) on the stream
    val mentions = graft.pipeline.Mentions.detectFast(transcripts, dictionary)
    val typed = mentions.select(col("conv_id"), col("turn_idx").cast("int"),
        col("span_start").cast("int"), col("span_end").cast("int"),
        col("id"), col("is_prop"), col("score").cast("double"))
      .as[graft.pipeline.Triples.MentionRow]
    val triples = typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (conv: String, it: Iterator[graft.pipeline.Triples.MentionRow],
            state: GroupState[ConvFocus]) => {
          val ms = graft.pipeline.Triples.sortMentions(it.toArray)
          val seed = state.getOption.map(s => (s.lastEnt, s.lastScore))
          val (out, lastEnt, lastScore) =
            graft.pipeline.Triples.walkTurns(conv, ms, seed)
          if (lastEnt != null) state.update(ConvFocus(lastEnt, lastScore))
          out.iterator
        })
      .toDF("subj", "pred", "obj", "conv_id", "turn_idx", "score")
    triples.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .outputMode("append")
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
