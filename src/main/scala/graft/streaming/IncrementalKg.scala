package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** The cross-batch conversation state: the focus entity the batch walker
  * carries between turns, persisted in the state store between micro-batches.
  */
final case class ConvFocus(lastEnt: String, lastScore: Double)

/** A buffered, not-yet-walked mention (wire shape of the out-of-order
  * buffer): span + link plus the turn's event time in epoch millis.
  */
final case class PendingMention(turnIdx: Int, spanStart: Int, spanEnd: Int,
    id: String, isProp: Boolean, score: Double, tsMillis: Long)

/** Per-conversation streaming state: the reorder buffer of turns the
  * watermark has not yet passed, plus the carried focus entity
  * (`lastEnt` null until the first entity mention is walked).
  */
final case class ConvBuffer(pending: Seq[PendingMention], lastEnt: String,
    lastScore: Double)

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

  /** Split the sorted reorder buffer at the first turn the watermark has NOT
    * passed: only WHOLE turns flush (all mentions of a turn share its event
    * time), and only as a prefix — a ripe turn behind an unripe one waits, so
    * the walk order never diverges from turn order.
    */
  private[streaming] def splitRipe(pending: Seq[PendingMention],
      watermarkMs: Long): (Seq[PendingMention], Seq[PendingMention]) = {
    var i = 0
    while (i < pending.length) {
      val turn = pending(i).turnIdx
      var j = i
      var ripe = true
      while (j < pending.length && pending(j).turnIdx == turn) {
        if (pending(j).tsMillis >= watermarkMs) ripe = false
        j += 1
      }
      if (!ripe) return pending.splitAt(i)
      i = j
    }
    (pending, Nil)
  }

  /** Reserved conversation id of flush sentinels ([[writeFlushSentinels]]) —
    * their mentions advance the watermark but their triples never reach the
    * sink.
    */
  val FlushConvId = "__graft_flush__"

  /** Write flush-sentinel turns into a file-source directory: `n` turns of
    * the reserved [[FlushConvId]] conversation carrying a known dictionary
    * `surface` (the watermark tracks the MENTION stream, so the sentinel
    * must produce a mention to move it) at ascending event times starting
    * past `afterTsMillis + 2×watermarkDelay`. Re-running the same
    * AvailableNow query (same checkpoint) after this call advances the
    * watermark past every real turn, so the whole buffered tail flushes —
    * the explicit end-of-stream flush a drained finite stream otherwise
    * lacks (VERDICT r04 #6). Each sentinel lands in its OWN file with
    * distinct mtimes, so even a `maxFilesPerTrigger=1` source sees the
    * watermark advance across batches; `n = 2` covers the
    * one-batch-lag of the watermark update. Sentinel rows carry null in
    * every column the input_hint schema has beyond (conv_id, turn_idx,
    * text, ts).
    */
  def writeFlushSentinels(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType, surface: String,
      afterTsMillis: Long, watermarkDelayMillis: Long, n: Int = 2): Unit = {
    import org.apache.spark.sql.Row
    (0 until n).foreach { i =>
      val ts = new java.sql.Timestamp(
        afterTsMillis + 2 * watermarkDelayMillis + (i + 1) * 1000L)
      val row = Row.fromSeq(schema.fields.map(_.name match {
        case "conv_id" => FlushConvId
        case "turn_idx" => i
        case "text" => surface
        case "ts" => ts
        case _ => null
      }).toSeq)
      spark.createDataFrame(
        java.util.Collections.singletonList(row), schema)
        .coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1200) // distinct mtimes → deterministic file order
    }
  }

  /** Cross-batch stateful triple extraction (VERDICT r02 next-step #8),
    * OUT-OF-ORDER TOLERANT (VERDICT r03 next-step #6): conversations may
    * split across micro-batches AND turns may arrive out of turn order
    * across batches. Mentions buffer in a per-conversation
    * `flatMapGroupsWithState` state store keyed by conv_id; turns are walked
    * (in turn_idx order, with the carried focus entity as seed) only once
    * the event-time watermark passes their timestamp — so a turn arriving a
    * batch late is sorted back into place before anything after it is
    * walked. An event-time timeout flushes the tail when the watermark
    * advances past it with no new rows for the conversation.
    *
    * Output matches `Triples.extract` over the concatenated batches whenever
    * every turn arrives within the watermark delay of the latest turn seen.
    * Turns arriving LATER than that are DROPPED by Spark's standard
    * late-data filter: `FlatMapGroupsWithStateExec` with EventTimeTimeout
    * removes input rows older than the late-events watermark BEFORE the
    * user function runs, so such turns never reach the reorder buffer
    * (ADVICE r04 — the watermark delay is the lateness contract, exactly as
    * for built-in windowed aggregation; pinned by a StreamingSpec case). A
    * turn up to one batch beyond the delay can still survive because the
    * late filter lags the watermark by one batch — callers must not rely
    * on it. The round-3 in-order append-log assumption is gone.
    *
    * Tail flush: turns the final watermark never passes stay buffered in
    * state (a live stream keeps flushing). For a DRAINED finite stream,
    * append [[writeFlushSentinels]] to the source and re-run the query —
    * the sentinel mentions advance the watermark past the tail, the buffer
    * flushes, and the sentinel conversation itself is filtered before the
    * sink.
    *
    * State TTL: a conversation whose buffer has drained re-arms an idle
    * event-time timeout of `idleTtlMs`; when it fires with nothing new
    * buffered, the state entry is REMOVED (ADVICE r04 — unbounded state
    * growth with conversation count otherwise). Cost of expiry: a
    * conversation resuming after an idle gap longer than `idleTtlMs` loses
    * its carried focus entity (its first property mentions fall back to
    * same-turn subjects) — the bounded-state trade a long-lived stream
    * needs.
    *
    * Sink: the parquet file sink (exactly-once via its `_spark_metadata`
    * transaction log), not foreachBatch — state + sink both recover from the
    * checkpoint after a restart.
    *
    * Watermark source: the MENTION stream (the typed scan strips attribute
    * metadata, so the watermark must attach to its output). Turns with no
    * dictionary match therefore don't advance it — immaterial on a live
    * corpus where some mention is always flowing, but a drained test stream
    * must end with a mention-bearing turn (or use the flush sentinels).
    */
  def statefulTriplesStream(
      transcripts: DataFrame,
      dictionary: DataFrame,
      outPath: String,
      queryName: String,
      checkpointDir: String,
      watermarkDelay: String = "10 seconds",
      idleTtlMs: Long = 30L * 60L * 1000L): StreamingQuery = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    // stateless per-turn mention scan (broadcast trie) on the stream; the
    // watermark attaches to the scan's OUTPUT ts (the typed scan strips
    // attribute metadata, so a transcript-level watermark would not reach
    // the stateful operator below)
    val mentions = graft.pipeline.Mentions.detectFastTs(transcripts, dictionary)
      .withWatermark("ts", watermarkDelay)
    val typed = mentions.select(col("conv_id"), col("turn_idx").cast("int"),
        col("span_start").cast("int"), col("span_end").cast("int"),
        col("id"), col("is_prop"), col("score").cast("double"), col("ts"))
      .as[(String, Int, Int, Int, String, Boolean, Double, java.sql.Timestamp)]
    val triples = typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (conv: String,
            it: Iterator[(String, Int, Int, Int, String, Boolean, Double, java.sql.Timestamp)],
            state: GroupState[ConvBuffer]) => {
          val prior = state.getOption.getOrElse(ConvBuffer(Nil, null, 0.0))
          val incoming = it.map(r =>
            PendingMention(r._2, r._3, r._4, r._5, r._6, r._7, r._8.getTime)).toSeq
          if (state.hasTimedOut && incoming.isEmpty && prior.pending.isEmpty) {
            // idle-TTL expiry of a DRAINED conversation: drop the carried
            // focus so the state store stays bounded in conversation count
            state.remove()
            Iterator.empty
          } else {
            val pending = (prior.pending ++ incoming)
              .sortBy(m => (m.turnIdx, m.spanStart, m.spanEnd, m.id))
            val wm = state.getCurrentWatermarkMs()
            val (ripe, rest) = splitRipe(pending, wm)
            val ms: Array[graft.pipeline.Triples.MentionRow] = ripe.map(m =>
              (conv, m.turnIdx, m.spanStart, m.spanEnd, m.id, m.isProp, m.score)).toArray
            val seed =
              if (prior.lastEnt != null) Some((prior.lastEnt, prior.lastScore)) else None
            val (out, lastEnt, lastScore) =
              graft.pipeline.Triples.walkTurns(conv, ms, seed)
            state.update(ConvBuffer(rest, lastEnt, lastScore))
            if (rest.nonEmpty)
              // wake this group when the watermark passes its buffered tail
              state.setTimeoutTimestamp(math.max(rest.map(_.tsMillis).max, wm) + 1)
            else
              // drained: arm the idle TTL — fires only if no new turn
              // re-arms it first
              state.setTimeoutTimestamp(wm + idleTtlMs)
            out.iterator
          }
        })
      .toDF("subj", "pred", "obj", "conv_id", "turn_idx", "score")
      // flush sentinels move the watermark; their conversation never ships
      .filter(col("conv_id") =!= lit(FlushConvId))
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
