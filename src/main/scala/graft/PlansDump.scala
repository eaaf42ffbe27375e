package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps `.explain("formatted")` for every declared query (plans/r06
  * artifacts) PLUS the internal lazy plans of the eager-materializing
  * operators (semantic dedup, curation, cluster dedup, IVF), whose
  * query-level explain shows only the final checkpoint scan.
  *
  * Usage: `sbt "runMain graft.PlansDump <outDir>"`; env as Bench.
  */
object PlansDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plansdump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"$name.txt"), txt.getBytes("UTF-8"))
      spark.catalog.clearCache()
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      dump(n, fn(spark, sfDir))
    }
    // internal lazy plans of the eager operators (what the query-level
    // explain hides behind its localCheckpoint scan)
    def tbl(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val docsSample = tbl("documents").filter(pmod(col("doc_id"), lit(20)) === 0)
    val embSample = tbl("embeddings").filter(pmod(col("vec_id"), lit(5)) === 0)
    val (sd, sdH) = graft.ops.Similarity.semanticDedupTracked(
      embSample, "vec_id", "embedding", thresholdPct = 30)
    dump("internal_semantic_dedup", sd)
    sdH.foreach(_.unpersist(blocking = false))
    val (cu, cuH) = graft.ops.Curate.curateTracked(
      docsSample, "doc_id", "text", minQualityMilli = 900, thresholdPct = 80)
    dump("internal_curate_corpus", cu)
    cuH.foreach(_.unpersist(blocking = false))
    val (cl, pairs, clH) = graft.ops.Dedup.minhashClustersTracked(
      docsSample, "doc_id", "text", numHashes = 32, bands = 8, thresholdPct = 80)
    dump("internal_dedup_cluster_pairs", pairs)
    dump("internal_dedup_clusters", cl)
    clH.foreach(_.unpersist(blocking = false))
    println(s"plans written to $outDir")
    spark.stop()
  }
}
