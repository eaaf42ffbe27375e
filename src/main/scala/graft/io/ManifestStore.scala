package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style table layer (SURVEY.md §7.0): partitioned Parquet plus a
  * per-stage JSON manifest recording input fingerprint, row count and commit
  * time. Gives the three properties the north rule uses Iceberg for —
  * atomic commit (manifest written last), lineage (fingerprint chain) and
  * idempotent resume (a stage whose manifest matches its input fingerprint is
  * read back instead of recomputed). A real Iceberg catalog can replace this
  * behind the same `runStage` seam; the sandbox ships no Iceberg runtime jar.
  */
final class ManifestStore(spark: SparkSession, baseDir: String) {

  private def manifestPath(stage: String): Path = Paths.get(baseDir, stage, "_MANIFEST.json")
  private def dataPath(stage: String): String = Paths.get(baseDir, stage, "data").toString

  def fingerprintOf(stage: String): Option[String] = {
    val p = manifestPath(stage)
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    "\"fingerprint\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(s).map(_.group(1))
  }

  def rowCountOf(stage: String): Option[Long] = {
    val p = manifestPath(stage)
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    "\"rows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
  }

  /** Run (or resume) a stage. `fingerprint` must deterministically describe
    * the stage's inputs + config; on match the previous output is read back.
    * Commit order: data → manifest, so a crash between the two re-runs the
    * stage (exactly-once materialization by manifest swap).
    * @return (output, resumed)
    */
  def runStage(
      stage: String, fingerprint: String,
      partitionBy: Seq[String] = Nil)(compute: => DataFrame): (DataFrame, Boolean) = {
    if (fingerprintOf(stage).contains(fingerprint)) {
      return (spark.read.parquet(dataPath(stage)), true)
    }
    val out = compute
    // row count observed DURING the write job — the round-2 shape re-read
    // the whole committed parquet just to count it (one extra full scan per
    // stage, a fixed IO cost the scaling pair paid at every stage)
    val obs = new org.apache.spark.sql.Observation(
      s"rows-$stage-${System.nanoTime()}")
    val writer = out.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows")).write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataPath(stage))
    val rows = obs.get("rows").asInstanceOf[Long]
    val written = spark.read.parquet(dataPath(stage))
    val manifest =
      s"""{"stage":"$stage","fingerprint":"$fingerprint","rows":$rows,"committed_at":${System.currentTimeMillis()}}"""
    val tmp = manifestPath(stage).resolveSibling("_MANIFEST.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(stage),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    (written, false)
  }
}
