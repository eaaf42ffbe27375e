package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization-loop harness (guide §1) — SEPARATE from the frozen
  * [[Bench]]: times any subset of the declared queries with the same
  * methodology (same session config, `count()` action, min-of-N,
  * clearCache between runs) and optionally
  *   - isolates the computation with the noop sink (guide §1.4), and
  *   - dumps `.explain("formatted")` per query (the plans/r06 artifacts).
  *
  * Usage: `sbt "runMain graft.BenchExtra [query ...]"` (no args = all).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (as Bench),
  *      SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_SINK=count|noop (default
  *      count — the driver's methodology), SPARK_GRAFT_PLANS_DIR (when set,
  *      writes `<dir>/<query>.txt` explain output and skips timing reps>1).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val sink = sys.env.getOrElse("SPARK_GRAFT_SINK", "count")
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_STAGELOG=1 → per-stage wall/task/shuffle log on stderr
    // (the headless stand-in for the UI's stage table, guide §7.1)
    if (sys.env.get("SPARK_GRAFT_STAGELOG").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = for {
              s <- si.submissionTime; c <- si.completionTime
            } yield c - s
            val m = si.taskMetrics
            System.err.println(
              f"[stage] id=${si.stageId}%-4d wall=${wall.getOrElse(-1L)}%-6d " +
                f"tasks=${si.numTasks}%-3d exec=${m.executorRunTime}%-7d " +
                f"shw=${m.shuffleWriteMetrics.bytesWritten}%-9d " +
                f"shr=${m.shuffleReadMetrics.totalBytesRead}%-9d ${si.name.take(90)}")
          }
        })

    val all = SparkEntry.queries
    val names =
      if (args.isEmpty) all.keys.toSeq.sorted
      else args.toSeq.flatMap { a =>
        if (all.contains(a)) Seq(a)
        else { System.err.println(s"unknown query: $a"); Nil }
      }
    val results = names.map { name =>
      val fn = all(name)
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      plansDir.foreach { dir =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$name.txt"),
          txt.getBytes("UTF-8"))
        spark.catalog.clearCache()
      }
      var best = Double.MaxValue
      for (rep <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (sink == "noop")
          df.write.format("noop").mode("overwrite").save()
        else df.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        // SPARK_GRAFT_PLANS_FINAL + PLANS_DIR: ALSO dump the post-execution
        // plan (<query>.final.txt) — the AQE-final tree with ReusedExchange /
        // AQEShuffleRead nodes that the pre-execution dump cannot show
        // (guide §7.2: "the SQL tab shows the final re-optimised plan").
        // The query's OWN QueryExecution must be driven to completion
        // (count()/noop wrap the plan in a new one), so run its toRdd.
        if (rep == 1 && sys.env.get("SPARK_GRAFT_PLANS_FINAL").contains("1"))
          plansDir.foreach { dir =>
            val qe = fn(spark, sfDir).queryExecution
            qe.toRdd.count()
            val txt = qe.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir).resolve(s"$name.final.txt"),
              txt.getBytes("UTF-8"))
            spark.catalog.clearCache()
          }
        spark.catalog.clearCache()
      }
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"extra","sink":"$sink","reps":$reps,""" +
      f""""total":${results.map(_._2).sum}%.3f,"queries":$qs}""")
    spark.stop()
  }
}
