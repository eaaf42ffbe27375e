package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Raw dump ingestion (SURVEY.md §2.1 S2–S4): buffered line scan → header
  * arity check → positional column split, with a stable per-line sequence
  * number.
  *
  * The reference materializes the whole file into a `Vec<String>`
  * (`kg-entities.rs:110`) — its scalability wall; here the file stays
  * partitioned and only the header is touched on the driver. `zipWithIndex`
  * is deterministic for a given file (partition order = split order), giving
  * the same first-wins/last-wins tie-break semantics as the reference's
  * input order.
  */
object TsvLoader {

  /** Read a headered TSV dump into positional string columns named by
    * `colNames`, asserting the header arity (`kg-entities.rs:111`,
    * `kg-properties.rs:51`). Rows with more columns are truncated, with
    * fewer padded with nulls (the parse layer then rejects or defaults,
    * `lib.rs:164,231`).
    */
  def load(spark: SparkSession, path: String, colNames: Seq[String]): DataFrame = {
    val lines = spark.read.textFile(path)
    val header = lines.first()
    val arity = header.split("\t", -1).length
    require(arity == colNames.length,
      s"header has $arity columns, expected ${colNames.length} (${colNames.mkString(",")})")
    val schema = StructType(
      colNames.map(n => StructField(n, StringType, nullable = true)) :+
        StructField("seq", LongType, nullable = false))
    val rows = lines.rdd
      .zipWithIndex()
      .filter { case (_, i) => i > 0 } // drop header
      .map { case (line, i) =>
        val parts = line.split("\t", -1)
        val padded = (0 until colNames.length).map(j =>
          if (j < parts.length) parts(j) else null)
        Row.fromSeq(padded :+ (i - 1))
      }
    spark.createDataFrame(rows, schema)
  }

  val entityCols: Seq[String] =
    Seq("ent", "ent_name", "ent_description", "links", "types", "aliases")
  val propertyCols: Seq[String] = Seq("p", "p_label", "p_count", "p_aliases", "p_invs")

  def loadEntities(spark: SparkSession, path: String): DataFrame =
    load(spark, path, entityCols)

  def loadProperties(spark: SparkSession, path: String): DataFrame =
    load(spark, path, propertyCols)

  /** Redirect file: 2 columns, no header in the reference path
    * (`kg-entities.rs:63-93`); ids regex-filtered by the caller.
    */
  def loadRedirects(spark: SparkSession, path: String, entPattern: String): DataFrame =
    spark.read.textFile(path).toDF("line")
      .select(split(col("line"), "\t").as("c"))
      .filter(size(col("c")) === 2)
      .select(
        regexp_extract(col("c").getItem(0), entPattern, 1).as("qid"),
        filter(
          transform(split(col("c").getItem(1), "; "),
            x => regexp_extract(trim(x), entPattern, 1)),
          x => length(x) > 0).as("redirects"))
      .filter(length(col("qid")) > 0 && size(col("redirects")) > 0)
}
