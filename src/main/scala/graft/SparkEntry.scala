package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full transcript→KG flow (dictionaries → broadcast mention
    * detection → salted link scoring → triple extraction → CC
    * canonicalization) on a small deterministic synthesized corpus.
    * Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val res = graft.pipeline.KgPipeline.run(
      spark,
      graft.synth.Synth.transcripts(spark, convs = 50, turnsPerConv = 8,
        nEnts = 300, mProps = 25),
      graft.synth.Synth.entityDump(spark, 300),
      graft.synth.Synth.propertyDump(spark, 25),
      graft.synth.Synth.redirects(spark, 300),
      out)
    res.edges
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
