package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-turn (subj, pred, obj) triple extraction over linked mentions
  * (SURVEY.md §2.9): conversations are windowed by conv_id ordered by
  * (turn_idx, span_start) — the stable turn ordering the north rule fixes —
  * and for every property mention,
  *
  *   subj = nearest entity mention BEFORE it (same turn or any earlier turn —
  *          the conversation-focus fallback),
  *   obj  = nearest entity mention AFTER it within the SAME turn.
  *
  * Both are ignore-null window lookups, so the stage is two window passes over
  * one partition-by-conversation sort — no joins, no shuffle beyond the
  * conv_id hash partition.
  */
object Triples {

  /** @param mentions (conv_id, turn_idx, span_start, span_end, id, is_prop, score)
    * @return (subj, pred, obj, conv_id, turn_idx, score)
    */
  def extract(mentions: DataFrame): DataFrame = {
    val wConv = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx"), col("span_start"), col("span_end"), col("id"))
    val entId = when(!col("is_prop"), col("id"))
    val entScore = when(!col("is_prop"), col("score"))
    val withCtx = mentions
      .withColumn("subj",
        last(entId, ignoreNulls = true)
          .over(wConv.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("subj_score",
        last(entScore, ignoreNulls = true)
          .over(wConv.rowsBetween(Window.unboundedPreceding, -1)))
      // nearest entity after, then constrain to same turn
      .withColumn("obj_cand",
        first(when(!col("is_prop"), struct(col("turn_idx").as("t"), col("id").as("i"),
          col("score").as("s"))), ignoreNulls = true)
          .over(wConv.rowsBetween(1, Window.unboundedFollowing)))
    withCtx
      .filter(col("is_prop") && col("subj").isNotNull &&
        col("obj_cand").isNotNull && col("obj_cand.t") === col("turn_idx"))
      .select(
        col("subj"),
        col("id").as("pred"),
        col("obj_cand.i").as("obj"),
        col("conv_id"),
        col("turn_idx"),
        ((col("subj_score") + col("obj_cand.s")) / 2.0 + col("score")).as("score"))
  }
}
