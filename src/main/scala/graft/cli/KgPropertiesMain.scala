package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IndexSinks, IndexStats, PropertyIndexBuilder}
import graft.parse.{Kg, ParseKit}
import graft.sources.TsvLoader

/** Reference-parity CLI: the `kg-properties` binary
  * (`/root/reference/src/bin/kg-properties.rs:16-39`) as a Spark driver.
  *
  * Flags (long form):
  *   --file F --output DIR --knowledge-base KB [--inverse-output F]
  *   [--no-aliases] [--short-properties] [--include-wikidata-qualifiers]
  *   [--progress (ignored)]
  */
object KgPropertiesMain {

  final case class CliArgs(
      file: String = "", output: String = "", kb: String = "",
      inverseOutput: Option[String] = None, noAliases: Boolean = false,
      shortProperties: Boolean = false, includeWikidataQualifiers: Boolean = false)

  def parseArgs(argv: Array[String]): CliArgs = {
    var a = CliArgs()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--file" | "-f" => a = a.copy(file = argv(i + 1)); i += 2
        case "--output" | "-o" => a = a.copy(output = argv(i + 1)); i += 2
        case "--knowledge-base" | "-k" => a = a.copy(kb = argv(i + 1)); i += 2
        case "--inverse-output" | "-i" => a = a.copy(inverseOutput = Some(argv(i + 1))); i += 2
        case "--no-aliases" | "-n" => a = a.copy(noAliases = true); i += 1
        case "--short-properties" | "-s" => a = a.copy(shortProperties = true); i += 1
        case "--include-wikidata-qualifiers" =>
          a = a.copy(includeWikidataQualifiers = true); i += 1
        case "--progress" | "-p" => i += 1 // accepted, no-op
        case other => throw new IllegalArgumentException(s"unknown flag: $other")
      }
    }
    require(a.file.nonEmpty && a.output.nonEmpty && a.kb.nonEmpty,
      "--file, --output and --knowledge-base are required")
    a
  }

  def run(spark: SparkSession, a: CliArgs): Unit = {
    val kg = KgEntitiesMain.kgOf(a.kb)
    val raw = TsvLoader.loadProperties(spark, a.file)
    val props = ParseKit.parseProperties(raw, kg)
    val index = PropertyIndexBuilder.build(props, a.noAliases).persist()

    // index.tsv: base line per pid + (optionally) one line per qualifier
    // prefix — formatted id uses the per-row prefix column, short or long
    // (kg-properties.rs:129-162)
    val rows = PropertyIndexBuilder.outputRows(index, a.includeWikidataQualifiers)
    val pfxCol = if (a.shortProperties) col("pfx") else col("pfx_long")
    val lines = rows.select(concat_ws("\t",
      ParseKit.formatProperty(kg, col("pid"), a.shortProperties, Some(pfxCol)),
      concat_ws("\t", col("surfaces"))).as("line"))
    IndexSinks.writeLines(lines.coalesce(1), s"${a.output}/index.tsv")
    IndexSinks.writeLines(IndexSinks.prefixLines(kg, spark, entities = false).coalesce(1),
      s"${a.output}/prefixes.tsv")

    a.inverseOutput.foreach { path =>
      val pairs = PropertyIndexBuilder.inversePairs(props, index)
        .select(ParseKit.formatProperty(kg, col("pid"), a.shortProperties).as("pid"),
          ParseKit.formatProperty(kg, col("inverse"), a.shortProperties).as("inverse"))
      IndexSinks.writeLines(IndexSinks.inverseLines(pairs).coalesce(1), path)
    }

    IndexStats.propertyStats(spark, index, props).collect().foreach { r =>
      println(f"${r.getString(0)}%-16s ${r.getDouble(1)}%.0f")
    }
    index.unpersist(blocking = false)
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("kg-properties")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, a)
    spark.stop()
  }
}
