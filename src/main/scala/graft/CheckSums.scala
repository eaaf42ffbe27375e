package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 equivalence gate: an order-insensitive checksum (row count +
  * bit_xor of per-row xxhash64 over the JSON rendering) of every declared
  * query's output. Optimizations this round must keep every query's result
  * multiset IDENTICAL — this harness proves old == new on the verify SFs
  * without needing the driver's DuckDB (the r5 outputs are oracle-proven,
  * so new == old ⇒ new passes the oracle).
  *
  * Usage: `sbt "runMain graft.CheckSums <sfDir> <outFile>"`.
  */
object CheckSums {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-checksums")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val line =
        try {
          val df = fn(spark, sfDir)
          val cols = df.columns.map(col)
          val r = df.select(to_json(struct(cols: _*)).as("j"))
            .agg(count(lit(1)).as("n"),
              coalesce(expr("bit_xor(xxhash64(j))"), lit(0L)).as("h"),
              coalesce(sum(xxhash64(col("j")).cast("decimal(38,0)")),
                lit(0L).cast("decimal(38,0)")).as("s"))
            .collect()(0)
          val schema = df.schema.map(f => f.name + ":" + f.dataType.sql).mkString(",")
          s""""$name":{"rows":${r.getLong(0)},"xor":${r.getLong(1)},"sum":${r.getDecimal(2)},"schema":"$schema"}"""
        } catch {
          case e: Throwable =>
            s""""$name":{"err":"${Option(e.getMessage).getOrElse(e.getClass.getName).take(120).replace("\"", "'").replace("\n", " ")}"}"""
        } finally spark.catalog.clearCache()
      line
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      out.mkString("{\n", ",\n", "\n}\n"))
    println(s"wrote $outFile")
    spark.stop()
  }
}
