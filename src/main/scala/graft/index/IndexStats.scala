package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's printed coverage statistics (S9/A9,
  * `kg-entities.rs:274-329`, `kg-properties.rs:106-114`) as a metrics
  * DataFrame — one row per stat so they land in the lineage/metrics sink
  * instead of stdout. Distinct-entity coverage uses exact distinct here;
  * swap `approx_count_distinct` at 100 TB (the stat is informational).
  */
object IndexStats {

  /** Entity-index stats: totals, per-stage uniques, final coverage.
    * `index` = (surface, info?, id, kind); `entities` = canonical dump.
    *
    * `unique_by_label` counts E1 entries ONLY (the reference's
    * num_label_unique, `kg-entities.rs:277`): kind-0 entries whose surface is
    * a size-1 label group in the dump. (Kind 0 alone would also count E3
    * plain-slot fallbacks from colliding labels and overstate E1 coverage;
    * for size-1 groups E1 and E3 coincide — an overridden single-label entity
    * is rerouted to the info slot in both.)
    */
  def entityStats(spark: SparkSession, index: DataFrame, entities: DataFrame): DataFrame = {
    import spark.implicits._
    // one job for the dump-side scalars
    val entAgg = entities
      .agg(count(lit(1)).as("n"), coalesce(sum(size(col("aliases"))), lit(0L)).as("na"))
      .collect()(0)
    val numEnts = entAgg.getLong(0)
    val totalAliases = entAgg.getLong(1)
    val byKind = index.groupBy("kind").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val labelSizes = entities.groupBy(col("label")).agg(count(lit(1)).as("grp_n"))
    val numLabelUnique = index.filter(col("kind") === 0)
      .join(labelSizes, index("surface") === labelSizes("label"), "left")
      .filter(col("grp_n") === 1).count()
    val numLabelInfo = byKind(0) + byKind(1)
    val total = byKind.values.sum
    val covered = index.select("id").distinct().count()
    def pct(a: Long, b: Long): Double = if (b == 0) 0.0 else 100.0 * a / b
    Seq(
      ("entities", numEnts.toDouble),
      ("unique_by_label", numLabelUnique.toDouble),
      ("label_coverage_pct", pct(numLabelUnique, numEnts)),
      ("unique_by_label_and_info", numLabelInfo.toDouble),
      ("label_info_coverage_pct", pct(numLabelInfo, numEnts)),
      ("added_unique_aliases", (total - numLabelInfo).toDouble),
      ("alias_promotion_pct", pct(total - numLabelInfo, totalAliases)),
      ("final_index_size", total.toDouble),
      ("final_index_coverage_pct", pct(covered, numEnts)))
      .toDF("stat", "value")
  }

  /** Property-index stats (`kg-properties.rs:106-114`). */
  def propertyStats(spark: SparkSession, index: DataFrame, properties: DataFrame): DataFrame = {
    import spark.implicits._
    val lines = properties.count()
    val byKind = index.groupBy("kind").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    Seq(
      ("lines", lines.toDouble),
      ("unique_by_label", byKind(0).toDouble),
      ("unique_aliases", byKind(1).toDouble),
      ("total_unique", (byKind(0) + byKind(1)).toDouble))
      .toDF("stat", "value")
  }
}
