package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.parse.{Kg, ParseKit}

/** Builds the natural-language property index: `(surface, pid, kind)` with
  * kind 0=Label, 1=Alias (the reference's `Prop` lattice, `lib.rs:74-88`).
  *
  * Re-expression of `/root/reference/src/bin/kg-properties.rs:53-104`:
  *  - A5 label dedup: on label collision keep the property with the higher
  *    count; FIRST input row wins ties (the Rust entry is only replaced on a
  *    strictly greater count, `kg-properties.rs:68-79`)
  *    → window top-1 by (count desc, seq asc).
  *  - A6 global alias frequency: occurrences counted across every parsed
  *    property WITHOUT per-property dedup (`kg-properties.rs:87-93`).
  *  - A7 unique-alias promotion: alias claims a slot iff its global occurrence
  *    count is exactly 1 and no label owns that surface
  *    (`kg-properties.rs:94-104`) → filter + left-anti join. Order-insensitive
  *    because a count-1 alias has a unique claimant by definition.
  */
object PropertyIndexBuilder {

  val KindLabel = 0
  val KindAlias = 1

  /** Input: canonical property schema `(pid, label, count, aliases, inverses,
    * seq)` with decorated labels and unique pids. Output: `(surface, pid, kind)`.
    * `noAliases` mirrors the reference's `--no-aliases` flag
    * (`kg-properties.rs:30-31,86`).
    */
  def build(props: DataFrame, noAliases: Boolean = false): DataFrame = {
    val wLabel = Window.partitionBy(col("label"))
      .orderBy(col("count").desc, col("seq").asc)
    val labels = props
      .withColumn("rn", row_number().over(wLabel))
      .filter(col("rn") === 1)
      .select(col("label").as("surface"), col("pid"), lit(KindLabel).as("kind"))
    if (noAliases) return labels

    val aliasOcc = props.select(col("pid"), explode(col("aliases")).as("surface"))
    val uniqueAliases = aliasOcc
      .groupBy(col("surface"))
      .agg(count(lit(1)).as("n"), max(col("pid")).as("pid"))
      .filter(col("n") === 1)
      .join(labels.select(col("surface").as("l_surface")),
        col("surface") === col("l_surface"), "left_anti")
      .select(col("surface"), col("pid"), lit(KindAlias).as("kind"))

    labels.union(uniqueAliases)
  }

  /** The per-property output rows of `kg-properties.rs:119-137`: surfaces
    * grouped by pid, primary label before aliases (`Prop` Ord), plus — for
    * Wikidata with qualifiers enabled — the five decorated qualifier variants
    * per surface (`kg-properties.rs:138-161`, P11).
    * Returns `(pid, pfx, surfaces: array<string>)`; `pfx` is null for the
    * base (wdt) row.
    */
  def outputRows(index: DataFrame, includeWikidataQualifiers: Boolean): DataFrame = {
    val base = index
      .groupBy(col("pid"))
      .agg(sort_array(collect_list(struct(col("kind"), col("surface")))).as("ss"))
      .select(col("pid"), lit(null: String).as("pfx"),
        lit(null: String).as("pfx_long"), col("ss.surface").as("surfaces"))
    if (!includeWikidataQualifiers) return base
    val quals = index
      .select(col("pid"),
        explode(ParseKit.wikidataQualifierVariants(col("surface"))).as("q"),
        col("kind"))
      .groupBy(col("pid"), col("q.pfx").as("pfx"), col("q.pfx_long").as("pfx_long"))
      .agg(sort_array(collect_list(struct(col("kind"), col("q.surface").as("surface"))))
        .as("ss"))
      .select(col("pid"), col("pfx"), col("pfx_long"), col("ss.surface").as("surfaces"))
    base.unionByName(quals)
  }

  /** Inverse-property pairs (`kg-properties.rs:169-188`): one row per
    * (pid, inverse) — only for pids that made it into the index (the Rust
    * loop iterates `output_dict.keys()`).
    */
  def inversePairs(props: DataFrame, index: DataFrame): DataFrame =
    props
      .join(index.select(col("pid")).distinct(), Seq("pid"), "left_semi")
      .select(col("pid"), explode(col("inverses")).as("inverse"))

  /** Static prefix table (`kg-properties.rs:164-167`, S6). */
  def prefixes(kg: Kg, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    kg.propertyPrefixes.toDF("short", "long")
  }
}
