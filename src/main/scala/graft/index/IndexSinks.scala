package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.{Kg, ParseKit}

/** Reference-parity output sinks (SURVEY.md §2.1 S5–S8): the TSV files the
  * reference's rayon writers emit (`kg-entities.rs:339-409`,
  * `kg-properties.rs:118-188`). Primary sink for OUR engine is Parquet via
  * ManifestStore; these exist so a reference user can diff artifacts.
  * Row order is load-bearing only WITHIN a line (kind lattice then surface,
  * `lib.rs:30-46`); file row order is nondeterministic in the reference
  * (rayon), so ours is whatever the partitioning yields.
  */
object IndexSinks {

  /** S5 (entities): one line per id —
    * `id \t primary-label [\t "label (info)"] \t aliases… \t alias-infos…`.
    * Input: (surface, info?, id, kind); ids pre-formatted by the caller
    * (short or long form, P10).
    */
  def entityIndexLines(index: DataFrame): DataFrame =
    index
      .withColumn("rendered",
        when(col("info").isNotNull && col("info") =!= "",
          concat(col("surface"), lit(" ("), col("info"), lit(")")))
          .otherwise(col("surface")))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("kind"), col("rendered")))).as("ls"))
      .select(concat_ws("\t", col("id"),
        concat_ws("\t", col("ls.rendered"))).as("line"))

  /** S5 (properties): `id \t label \t aliases…` ordered Label before Alias. */
  def propertyIndexLines(index: DataFrame): DataFrame =
    index
      .groupBy(col("pid"))
      .agg(sort_array(collect_list(struct(col("kind"), col("surface")))).as("ls"))
      .select(concat_ws("\t", col("pid"), concat_ws("\t", col("ls.surface"))).as("line"))

  /** S6: prefixes.tsv — tiny static table per KG
    * (`lib.rs:328-358`).
    */
  def prefixLines(kg: Kg, spark: SparkSession, entities: Boolean): DataFrame = {
    import spark.implicits._
    val rows = if (entities) kg.entityPrefixes else kg.propertyPrefixes
    rows.map { case (s, l) => s"$s\t$l" }.toDF("line")
  }

  /** S7: redirects.tsv — `ent \t redir1 \t redir2…` for entities with
    * redirects (`kg-entities.rs:389-396`).
    */
  def redirectLines(redirects: DataFrame): DataFrame =
    redirects
      .filter(size(col("redirects")) > 0)
      .select(concat_ws("\t", col("qid"), concat_ws("\t", col("redirects"))).as("line"))

  /** S8: inverse-property file — one `prop \t inverse` line per pair
    * (`kg-properties.rs:169-188`).
    */
  def inverseLines(inversePairs: DataFrame): DataFrame =
    inversePairs.select(concat_ws("\t", col("pid"), col("inverse")).as("line"))

  /** Write a single-column `line` DataFrame as a headerless TSV-ish text
    * directory (content bytes identical to the reference's file modulo row
    * order).
    */
  def writeLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)
}
