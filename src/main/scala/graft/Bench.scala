package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Sections:
  *  1. every SparkEntry query timed on SPARK_GRAFT_SF_DIR ("queries"),
  *     min-of-3 per query (single runs on this shared VM carry multi-second
  *     contention outliers); a query that THROWS is recorded in "errors" —
  *     never as a fake timing. The active section set is recorded in
  *     "sections"; a skipped section emits JSON null, never a placeholder;
  *  2. the end-to-end KG pipeline (extract→link→canonicalize→materialize)
  *     on a synthesized transcript corpus → triples/sec ("triples_per_sec");
  *  3. the north-rule two-parallelism scaling runs: the SAME pipeline job on
  *     identical input at N and 4N cores. Reported twice:
  *       "scaling"      = local[2] → local[8]  (both below this VM's DRAM
  *                        bandwidth ceiling — see BASELINE.md: shuffle-class
  *                        work on this single-socket box saturates memory
  *                        bandwidth at ≤8 threads, so thread pairs above it
  *                        measure the memory bus, not the engine),
  *       "scaling_wide" = local[8] → local[32] (reported for transparency),
  *       "scaling_narrow" = the compute-bound broadcast mention scan at
  *                        local[1] → local[4], best-of-4,
  *       "scaling_bucketed" = the same 2→8 span with the conv-bucketed
  *                        mentions stage (the recommended production shape;
  *                        strictly faster walls, reported separately so the
  *                        headline pair stays round-comparable);
  *  4. shuffle-write bytes of the MinHash-LSH query ("lsh_shuffle_bytes") —
  *     the ids-only-banding regression guard.
  */
object Bench {

  private def buildSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private final class ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** Each timed run writes multi-GB stage outputs; deleting them right
    * after the count keeps BOTH the disk and the page cache clean — without
    * this, runs later in the bench (always the HIGHER parallelism levels)
    * measured against a fuller disk and dirtier cache, a systematic bias
    * against exactly the side the scaling criterion divides by (and ~50 GB
    * of leaked /tmp per bench invocation).
    */
  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
  }

  /** Run the full pipeline on a fresh synthesized corpus; returns
    * (triples emitted, wall seconds). The output directory is deleted after
    * the count (see [[deleteRecursively]]).
    */
  def pipelineRun(spark: SparkSession, convs: Long, turns: Int,
      ents: Long, props: Long, mentionBuckets: Int = 0): (Long, Double) = {
    val out = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val t0 = System.nanoTime()
    val res = graft.pipeline.KgPipeline.run(
      spark,
      graft.synth.Synth.transcripts(spark, convs, turns, ents, props),
      graft.synth.Synth.entityDump(spark, ents),
      graft.synth.Synth.propertyDump(spark, props),
      graft.synth.Synth.redirects(spark, ents),
      out,
      inputVersion = s"bench-$convs-$turns-$ents-$props",
      mentionBuckets = mentionBuckets)
    val nTriples = res.triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    deleteRecursively(out)
    (nTriples, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // local-iteration knob: run a subset of sections (the driver runs all)
    val sections = sys.env.getOrElse("SPARK_GRAFT_BENCH_SECTIONS",
      "narrow,scaling,full,queries").split(",").map(_.trim).toSet

    // ---- full-pipeline scaling runs (each needs its own session/master) ----
    // a small warmup run per session pays the one-time JVM/codegen costs so
    // the N vs 4N comparison measures the job, not classloading.
    // large enough that per-task work dominates fixed stage costs — the
    // efficiency number is meaningless when the job is all scheduling
    val scale = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "100000").toLong
    // dictionary scales with the corpus (at 10^12 turns the dictionary is
    // 10^8 entities) — a toy dictionary turns stage 1 into fixed overhead
    // and the efficiency number into an Amdahl artifact.
    val dictEnts = math.max(scale * 5, 1000L)
    val dictProps = math.max(scale / 20, 50L)
    // ---- narrow compute-bound scaling pair (1 vs 4) ----
    // Shuffle-class work saturates this VM's memory bandwidth with very few
    // threads (see BASELINE.md microbenchmarks), so full-pipeline pairs above
    // the ceiling understate real N→4N EXECUTOR scaling where memory buses
    // multiply. The broadcast trie mention scan is the pipeline's dominant
    // compute and is bandwidth-light: its 1→4 pair evidences per-core scaling.
    def scanRun(cpus: Int, repeats: Int): (Long, Double) = {
      val s = buildSession(cpus)
      val ents = graft.synth.Synth.entityDump(s, 5000)
      val props = graft.synth.Synth.propertyDump(s, 200)
      val dict = graft.pipeline.KgPipeline.dictionary(
        graft.index.EntityIndexBuilder.build(ents), ents,
        graft.index.PropertyIndexBuilder.build(props), props).persist()
      dict.count()
      graft.pipeline.Mentions.detectFast(
        graft.synth.Synth.transcripts(s, 100, 5, 5000, 200), dict).count()
      // 16M turns: the shared-VM noise floor is additive (~2-4 s per run),
      // so the measurement must dwarf it at BOTH parallelism levels
      val turns = graft.synth.Synth.transcripts(s, 800000, 20, 5000, 200)
      // floor estimation under shared-VM noise: repeats scale with observed
      // variance (the short 4-thread runs spread ±40% run-to-run; the long
      // 1-thread runs ±10%) — min over repeats approximates the noise-free
      // wall either way
      var best = Double.MaxValue
      var n = 0L
      for (_ <- 1 to repeats) {
        val t0 = System.nanoTime()
        n = graft.pipeline.Mentions.detectFast(turns, dict).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      s.stop()
      System.gc()
      (n, best)
    }
    // a SKIPPED section must be visibly absent from the artifact (JSON
    // null), never a plausible-looking synthetic number (ADVICE r03 #1);
    // the active section set is recorded alongside.
    val narrowOpt =
      if (sections("narrow")) {
        val (m1, ts1) = scanRun(1, repeats = 2)
        val (m4, ts4) = scanRun(4, repeats = 5)
        Some((m1, ts1, m4, ts4))
      } else None

    // The SCALING job is the north-rule span — extract → link → canonicalize
    // → materialize over an ALREADY-BUILT dictionary (the reference's index
    // is a weekly batch artifact reused across every transcript load; its
    // construction is not part of the rule's four stages). The dictionary is
    // FIXED (a property of the KG, not of transcript volume) while the
    // transcript corpus is 6× the full-pipeline scale, so per-job fixed costs
    // (driver scheduling, broadcast/trie prep, CC round overhead — all O(1)
    // in corpus size) don't masquerade as a scaling ceiling. Best-of-2 per
    // parallelism level: single-run wall times on this shared VM vary ±20%
    // (page cache, frequency scaling) — larger than the margins measured.
    val scaleConvs = scale * 6
    val scaleDictEnts = 500000L
    val scaleDictProps = 5000L
    def scalingRun(c: Int, buckets: Int = 0, repsOverride: Int = 0): (Long, Double, Seq[Double]) = {
      val s = buildSession(c)
      val ents = graft.synth.Synth.entityDump(s, scaleDictEnts).persist()
      ents.count()
      val props = graft.synth.Synth.propertyDump(s, scaleDictProps)
      val reds = graft.synth.Synth.redirects(s, scaleDictEnts)
      val ei = graft.index.EntityIndexBuilder.build(ents)
      val pi = graft.index.PropertyIndexBuilder.build(props)
      val dict = graft.pipeline.KgPipeline.dictionary(ei, ents, pi, props).persist()
      val dictRows = dict.count()
      def timedRun(convs: Long): (Long, Double) = {
        val out = java.nio.file.Files.createTempDirectory("graft-scale").toString
        val t0 = System.nanoTime()
        val r = graft.pipeline.KgPipeline.linkAndMaterialize(
          s, graft.synth.Synth.transcripts(s, convs, 20, scaleDictEnts, scaleDictProps),
          ents, reds, dict, ei, pi, out, inputVersion = s"scale-$convs",
          dictRowsHint = Some(dictRows), dictVersion = s"bench-dict-$scaleDictEnts",
          mentionBuckets = buckets)
        val n = r.triples.count()
        val sec = (System.nanoTime() - t0) / 1e9
        deleteRecursively(out) // outside the timed span; see scaladoc
        (n, sec)
      }
      timedRun(200) // warmup
      // min-of-3 on the PAIR levels (2, 8): this shared VM has multi-minute
      // slow phases that move single runs ±20–40% — a contended roll on ONE
      // side flips the pair efficiency by 0.2 (observed 0.476 vs 0.67–0.73
      // across otherwise identical runs). All walls are reported in the
      // JSON so a noisy artifact is diagnosable. The 32-thread run feeds
      // only the transparency fields — one run keeps total wall bounded.
      val reps = if (repsOverride > 0) repsOverride else if (c <= 8) 3 else 1
      val runs = (1 to reps).map(_ => timedRun(scaleConvs))
      s.stop()
      System.gc() // don't let this session's garbage tax the next session
      (runs.head._1, runs.map(_._2).min, runs.map(_._2))
    }
    val scalingOpt =
      if (sections("scaling")) {
        val (n2, t2, runs2) = scalingRun(2)
        val (n8, t8, runs8) = scalingRun(8)
        val (n32, t32, _) = scalingRun(cpus)
        Some((n2, t2, runs2, n8, t8, runs8, n32, t32))
      } else None
    // the conv-BUCKETED mentions shape (one write-side shuffle replaces one
    // exchange per downstream consumer): strictly faster absolute walls at
    // both pair levels (probed −13% at 8 threads, −21% at 2); reported as
    // its own object so the headline pair stays comparable across rounds.
    // Min-of-2 — the shape comparison needs less precision than the pair.
    val scalingBucketedOpt =
      if (sections("scaling")) {
        val (bn2, bt2, bruns2) = scalingRun(2, buckets = 8, repsOverride = 2)
        val (bn8, bt8, bruns8) = scalingRun(8, buckets = 8, repsOverride = 2)
        Some((bn2, bt2, bruns2, bn8, bt8, bruns8))
      } else None

    // full pipeline INCLUDING index construction, best-of-2 at full width —
    // the number comparable to the reference's end-to-end `make index` wall
    // full width uses the bucketed mentions stage — the library's
    // recommended production shape (strictly faster; see scaling_bucketed)
    val fullOpt = if (sections("full")) {
      val sFull = buildSession(cpus)
      pipelineRun(sFull, 100, 5, 500, 50) // warmup
      val f1 = pipelineRun(sFull, scale, 20, dictEnts, dictProps, mentionBuckets = cpus)
      val f2 = pipelineRun(sFull, scale, 20, dictEnts, dictProps, mentionBuckets = cpus)
      sFull.stop()
      Some((f1._1, math.min(f1._2, f2._2)))
    } else None

    // ---- per-query timings on the harness tables ----
    val sparkQ = buildSession(cpus)
    val shuffleBytes = new ShuffleBytes
    sparkQ.sparkContext.addSparkListener(shuffleBytes)
    var lshShuffleBytes = -1L
    val errors = scala.collection.mutable.Map.empty[String, String]
    val queryList =
      if (sections("queries")) SparkEntry.queries.toSeq.sortBy(_._1) else Nil
    // min-of-3 per query: single-run per-query timings on this shared VM
    // carry multi-second contention outliers (BENCH_r03's 5.4 s
    // dedup_jaccard_pairs vs 0.7–1.1 s in every committed replicate —
    // VERDICT r03 #5); the min approximates the contention-free wall the
    // same way the scaling pairs already do
    val queryReps = 3
    val results = queryList.map { case (name, fn) =>
      var best = Double.MaxValue
      var rep = 0
      while (rep < queryReps && !errors.contains(name)) {
        val before = shuffleBytes.bytes.get()
        val t0 = System.nanoTime()
        try fn(sparkQ, sfDir).count()
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
        }
        finally sparkQ.catalog.clearCache()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        // the shuffle-bytes regression guard reads ONE run's delta
        if (rep == 0 && name == "dedup_minhash_lsh")
          lshShuffleBytes = shuffleBytes.bytes.get() - before
        rep += 1
      }
      name -> best
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    def jarr(xs: Seq[Double]) = xs.map(x => f"$x%.1f").mkString("[", ",", "]")
    val scaling = scalingOpt.map { case (n2, t2, runs2, n8, t8, runs8, _, _) =>
      val tput2 = n2 / t2; val tput8 = n8 / t8
      f"""{"cpus_low":2,"cpus_high":8,"triples":$n8,""" +
        f""""sec_low":$t2%.1f,"sec_high":$t8%.1f,""" +
        f""""runs_low":${jarr(runs2)},"runs_high":${jarr(runs8)},""" +
        f""""tput_low":$tput2%.1f,"tput_high":$tput8%.1f,""" +
        f""""efficiency":${(tput8 / tput2) / 4.0}%.3f}"""
    }.getOrElse("null")
    val scalingWide = scalingOpt.map { case (_, _, _, n8, t8, _, n32, t32) =>
      val tput8 = n8 / t8; val tput32 = n32 / t32
      f"""{"cpus_low":8,"cpus_high":$cpus,"triples":$n32,""" +
        f""""sec_low":$t8%.1f,"sec_high":$t32%.1f,""" +
        f""""tput_low":$tput8%.1f,"tput_high":$tput32%.1f,""" +
        f""""efficiency":${(tput32 / tput8) / (cpus / 8.0)}%.3f}"""
    }.getOrElse("null")
    val scalingBucketed = scalingBucketedOpt.map {
      case (_, bt2, bruns2, bn8, bt8, bruns8) =>
        val btput2 = bn8 / bt2; val btput8 = bn8 / bt8
        f"""{"cpus_low":2,"cpus_high":8,"buckets":8,"triples":$bn8,""" +
          f""""sec_low":$bt2%.1f,"sec_high":$bt8%.1f,""" +
          f""""runs_low":${jarr(bruns2)},"runs_high":${jarr(bruns8)},""" +
          f""""tput_low":$btput2%.1f,"tput_high":$btput8%.1f,""" +
          f""""efficiency":${(btput8 / btput2) / 4.0}%.3f}"""
    }.getOrElse("null")
    val scalingNarrow = narrowOpt.map { case (m1, ts1, m4, ts4) =>
      f"""{"cpus_low":1,"cpus_high":4,"mentions":$m4,""" +
        f""""sec_low":$ts1%.1f,"sec_high":$ts4%.1f,""" +
        f""""tput_low":${m1 / ts1}%.1f,"tput_high":${m4 / ts4}%.1f,""" +
        f""""efficiency":${((m4 / ts4) / (m1 / ts1)) / 4.0}%.3f}"""
    }.getOrElse("null")
    val fullPipeline = fullOpt.map { case (nFull, tFull) =>
      f"""{"cpus":$cpus,"triples":$nFull,"sec":$tFull%.1f,""" +
        f""""tput":${nFull / tFull}%.1f}"""
    }.getOrElse("null")
    val tputTop = scalingOpt.map { case (_, _, _, _, _, _, n32, t32) =>
      f"${n32 / t32}%.1f"
    }.getOrElse("null")
    val sectionsJson = sections.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""query_reps":$queryReps,"sections":$sectionsJson,""" +
        f""""errors":$errJson,"sf":"$sfDir","triples_per_sec":$tputTop,""" +
        f""""full_pipeline":$fullPipeline,""" +
        f""""lsh_shuffle_bytes":$lshShuffleBytes,""" +
        f""""scaling":$scaling,"scaling_wide":$scalingWide,""" +
        f""""scaling_bucketed":$scalingBucketed,""" +
        f""""scaling_narrow":$scalingNarrow}""")
    sparkQ.stop()
  }
}
