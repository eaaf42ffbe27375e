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
    // both lookups use GROWING frames (unboundedPreceding → -1), which Spark
    // evaluates incrementally in O(n) per partition; the "nearest entity
    // after" is the same growing frame over the REVERSED sort order — a
    // shrinking (1 → unboundedFollowing) frame would re-scan per row.
    val wAsc = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx").asc, col("span_start").asc, col("span_end").asc,
        col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx").desc, col("span_start").desc, col("span_end").desc,
        col("id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val entId = when(!col("is_prop"), col("id"))
    val entScore = when(!col("is_prop"), col("score"))
    val withCtx = mentions
      .withColumn("subj", last(entId, ignoreNulls = true).over(wAsc))
      .withColumn("subj_score", last(entScore, ignoreNulls = true).over(wAsc))
      // nearest entity after, then constrain to same turn
      .withColumn("obj_cand",
        last(when(!col("is_prop"), struct(col("turn_idx").as("t"), col("id").as("i"),
          col("score").as("s"))), ignoreNulls = true)
          .over(wDesc))
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

  /** Single-pass variant of [[extract]] — identical semantics
    * (equivalence-tested), one shuffle + one sort instead of two opposite-
    * order window sorts: conversations group on one key, each group is a
    * bounded turn sequence walked once. The per-group state (conversation
    * focus entity) is exactly what the two growing window frames encode.
    */
  def extractFast(mentions: DataFrame): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions
      .select(col("conv_id"), col("turn_idx").cast("int"),
        col("span_start").cast("int"), col("span_end").cast("int"),
        col("id"), col("is_prop"), col("score").cast("double"))
      .as[(String, Int, Int, Int, String, Boolean, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        val ms = it.toArray.sortBy(m => (m._2, m._3, m._4, m._5))
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, String, String, Int, Double)]
        var lastEnt: String = null
        var lastScore = 0.0
        var turnStart = 0
        while (turnStart < ms.length) {
          val turn = ms(turnStart)._2
          var turnEnd = turnStart
          while (turnEnd < ms.length && ms(turnEnd)._2 == turn) turnEnd += 1
          var i = turnStart
          while (i < turnEnd) {
            val m = ms(i)
            if (m._6) { // property mention
              if (lastEnt != null) {
                // nearest following entity in the SAME turn
                var j = i + 1
                while (j < turnEnd && ms(j)._6) j += 1
                if (j < turnEnd) {
                  val o = ms(j)
                  out += ((lastEnt, m._5, o._5, conv, turn,
                    (lastScore + o._7) / 2.0 + m._7))
                }
              }
            } else { lastEnt = m._5; lastScore = m._7 }
            i += 1
          }
          turnStart = turnEnd
        }
        out.iterator
      }
      .toDF("subj", "pred", "obj", "conv_id", "turn_idx", "score")
  }
}
