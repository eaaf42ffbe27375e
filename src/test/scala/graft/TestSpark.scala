package graft

import org.apache.spark.sql.SparkSession

/** One local SparkSession shared by every suite (guide: one per suite; we go
  * one per JVM — the suites are all batch and stateless).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // deployment-grade function injection exercised by the whole suite
      // (spark.sql.extensions is STATIC — it must be set at context launch)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
