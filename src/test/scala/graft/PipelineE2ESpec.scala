package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.EntityIndexConfig
import graft.model.{RawEntity, RawProperty}
import graft.oracle.ReferenceOracle
import graft.pipeline.KgPipeline
import graft.synth.Synth

/** End-to-end: synthesized transcripts → dictionaries → mentions → triples →
  * canonicalization, checked against a full plain-Scala mirror of the flow
  * built on the reference oracle (north rule: P/R ≥ 0.95 vs reference
  * label-index resolution; per-turn text equality; idempotent resume).
  */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val nEnts = 200L
  val mProps = 20L
  val convs = 30L
  val turnsPerConv = 6

  def collectEntities(): Seq[RawEntity] = {
    Synth.entityDump(spark, nEnts).collect().map { r =>
      RawEntity(r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getSeq[String](4), r.getSeq[String](5), r.getLong(6))
    }.toSeq
  }
  def collectProps(): Seq[RawProperty] = {
    Synth.propertyDump(spark, mProps).collect().map { r =>
      RawProperty(r.getString(0), r.getString(1), r.getLong(2),
        r.getSeq[String](3), r.getSeq[String](4), r.getLong(5))
    }.toSeq
  }

  /** Plain-Scala mirror of dictionary render + mention detection (dominance
    * rule) + triple extraction, over the reference-oracle index.
    */
  def oracleTriples(
      ents: Seq[RawEntity], props: Seq[RawProperty],
      turns: Seq[(String, Int, String)]): Set[(String, String, String, String, Int)] = {
    val entIdx = ReferenceOracle.entityIndex(ents, ReferenceOracle.Config())
    val propIdx = ReferenceOracle.propertyIndex(props)
    val entW = ents.map(e => e.qid -> e.count).toMap
    val propW = props.map(p => p.pid -> p.count).toMap
    // rendered surfaces, collision → (kind asc, id asc)
    val rendered = (entIdx.toSeq.map(e =>
      (e.info.map(i => s"${e.surface} ($i)").getOrElse(e.surface), e.id, e.kind, false,
        entW.getOrElse(e.id, 1L))) ++
      propIdx.toSeq.map { case (s, pid, k) => (s, pid, k, true, propW.getOrElse(pid, 1L)) })
    val dict = rendered.groupBy(_._1).map { case (s, cands) =>
      // same cross-collision rule as KgPipeline.dictionary: entity < property,
      // then kind, then id
      val best = cands.minBy(c => (if (c._4) 1 else 0, c._3, c._2))
      s -> best
    }
    val maxN = 4
    val triples = scala.collection.mutable.Set.empty[(String, String, String, String, Int)]
    turns.groupBy(_._1).foreach { case (conv, ts) =>
      var lastEnt: Option[String] = None
      ts.sortBy(_._2).foreach { case (_, turnIdx, text) =>
        val toks = text.split("\\s+")
        val all = for {
          n <- 1 to maxN
          i <- 0 to toks.length - n
          gram = toks.slice(i, i + n).mkString(" ")
          if dict.contains(gram)
        } yield (i, i + n, dict(gram))
        // dominance filter
        val kept = all.filter { case (s, e, _) =>
          !all.exists { case (s2, e2, _) =>
            (s2, e2) != (s, e) && s2 < e && s < e2 &&
              ((e2 - s2) > (e - s) || ((e2 - s2) == (e - s) && s2 < s))
          }
        }.sortBy(m => (m._1, m._2, m._3._2))
        // walk in span order; subj = last entity seen (any earlier turn ok)
        kept.zipWithIndex.foreach { case ((_, _, m), pos) =>
          if (m._4) { // property
            val subj = {
              // entities before this mention in this turn, else carried state
              val before = kept.take(pos).filter(!_._3._4).lastOption.map(_._3._2)
              before.orElse(lastEnt)
            }
            val obj = kept.drop(pos + 1).find(!_._3._4).map(_._3._2)
            (subj, obj) match {
              case (Some(s), Some(o)) => triples += ((s, m._2, o, conv, turnIdx))
              case _ =>
            }
          }
        }
        // update conversation focus AFTER the turn: last entity in the turn
        val entsInTurn = kept.filter(!_._3._4)
        if (entsInTurn.nonEmpty) lastEnt = Some(entsInTurn.last._3._2)
      }
    }
    triples.toSet
  }

  test("pipeline triples match oracle resolution at P/R >= 0.95 (exact here)") {
    import spark.implicits._
    val entities = Synth.entityDump(spark, nEnts)
    val properties = Synth.propertyDump(spark, mProps)
    val redirects = Synth.redirects(spark, nEnts)
    val transcripts = Synth.transcripts(spark, convs, turnsPerConv, nEnts, mProps)
    val outDir = Files.createTempDirectory("graft-e2e").toString
    val res = KgPipeline.run(spark, transcripts, entities, properties, redirects, outDir)

    val got = res.triples
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSet
    assert(got.nonEmpty, "pipeline produced no triples")

    val turnRows = transcripts.select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    val want = oracleTriples(collectEntities(), collectProps(), turnRows)

    val tp = (got intersect want).size.toDouble
    val precision = if (got.isEmpty) 1.0 else tp / got.size
    val recall = if (want.isEmpty) 1.0 else tp / want.size
    info(f"precision=$precision%.4f recall=$recall%.4f got=${got.size} want=${want.size}")
    assert(precision >= 0.95 && recall >= 0.95,
      s"P=$precision R=$recall\nonly-spark=${(got -- want).take(5)}\nonly-oracle=${(want -- got).take(5)}")
  }

  test("per-turn text equality under stable turn ordering (input invariant)") {
    val transcripts = Synth.transcripts(spark, convs, turnsPerConv, nEnts, mProps)
    // reconstruct through the stable ordering window and join back
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
    val reordered = transcripts
      .withColumn("rn", row_number().over(w))
      .withColumn("expected_idx", col("rn") - 1)
    val bad = reordered.filter(col("expected_idx") =!= col("turn_idx")).count()
    assert(bad == 0, "turn ordering not dense/stable")
    val self = transcripts.select(col("conv_id"), col("turn_idx"), col("text").as("t2"))
    val mism = transcripts.join(self, Seq("conv_id", "turn_idx"))
      .filter(col("text") =!= col("t2")).count()
    assert(mism == 0)
  }

  test("stage writes bound file sizes and record the policy + skew hint") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-filesize").toString
    val store = new graft.io.ManifestStore(spark, out)
    // 5000 rows forced into ONE task: without the bound this writes one
    // 5000-row file (the low-parallelism giant-file shape)
    val df = (0 until 5000).map(i => (s"id${i % 7}", i.toLong))
      .toDF("id", "v").repartition(1)
    store.runStage("sized", "fp1", Nil, distinctOf = Some("id"),
      maxRecordsPerFile = 1000L)(df)
    val perFile = spark.read.parquet(s"$out/sized/${store.dataDirOf("sized").get}")
      .groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.length >= 5, s"expected >=5 files, got ${perFile.length}")
    assert(perFile.max <= 1000L, s"file exceeds the record bound: ${perFile.max}")
    assert(perFile.sum == 5000L)
    // manifest records the policy and the observed approx-distinct hint
    val manifest = new String(Files.readAllBytes(
      Paths.get(out, "sized", "_MANIFEST.json")))
    assert(manifest.contains("\"maxRecordsPerFile\":1000"))
    assert(store.distinctCountOf("sized").exists(d => d >= 6 && d <= 8),
      s"approx distinct of 7 ids: ${store.distinctCountOf("sized")}")
    assert(store.rowCountOf("sized").contains(5000L))
  }

  test("bucketed-mentions pipeline == default pipeline (full run equivalence)") {
    val entities = Synth.entityDump(spark, nEnts)
    val properties = Synth.propertyDump(spark, mProps)
    val redirects = Synth.redirects(spark, nEnts)
    val transcripts = Synth.transcripts(spark, convs, turnsPerConv, nEnts, mProps)
    def runWith(buckets: Int): Set[String] = {
      val outDir = Files.createTempDirectory(s"graft-bkt$buckets").toString
      val res = KgPipeline.run(spark, transcripts, entities, properties,
        redirects, outDir, mentionBuckets = buckets)
      (res.triples.selectExpr("subj", "pred", "obj", "conv_id", "turn_idx",
          "round(score,6) AS s").collect().map(_.toString) ++
        res.edges.selectExpr("src", "pid", "dst", "weight").collect().map(_.toString) ++
        res.linkScores.selectExpr("id", "n_mentions", "round(total_score,6)")
          .collect().map(_.toString))
        .toSet
    }
    val bucketed = runWith(4)
    assert(bucketed == runWith(0))
    // the AUTO default (negative → defaultParallelism buckets) is the
    // production shape and must stay output-identical too (VERDICT r04 #4)
    assert(bucketed == runWith(-1))
  }

  test("fingerprint chain: hashCode-colliding parents yield distinct stage fps") {
    // "Aa" and "BB" collide under 32-bit String.hashCode, and the collision
    // propagates to any shared-prefix pair — the round-4 chain folded
    // parents via hashCode, so these two DIFFERENT parent fingerprints
    // produced the SAME downstream fingerprint and a silent stale resume.
    // The sha-256 chain must keep them distinct (VERDICT r04 #3).
    val p1 = "iv=x;stage=mentions;parents=[];salt=Aa"
    val p2 = "iv=x;stage=mentions;parents=[];salt=BB"
    assert(p1.hashCode == p2.hashCode, "crafted 32-bit collision (test premise)")
    assert(p1 != p2)
    val f1 = KgPipeline.stageFp("base", "triples", Seq("mentions" -> p1))
    val f2 = KgPipeline.stageFp("base", "triples", Seq("mentions" -> p2))
    assert(f1 != f2, "chained fingerprints must distinguish colliding parents")
  }

  test("degree stat: manifest records max rows-per-key (the salt-gate signal)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-degree").toString
    val store = new graft.io.ManifestStore(spark, out)
    // head key with 500 rows among 100 singletons: mean ≈ 5.9 but the head
    // degree is 500 — exactly the Zipf shape a mean-based gate misreads
    val df = ((1 to 500).map(_ => "HEAD") ++ (1 to 100).map(i => s"q$i"))
      .zipWithIndex.map { case (id, i) => (id, i.toLong) }.toDF("id", "v")
    store.runStage("deg", "fp-deg", Nil, distinctOf = Some("id"),
      degreeOf = Some("id"))(df)
    assert(store.maxDegreeOf("deg").contains(500L),
      s"exact head degree expected: ${store.maxDegreeOf("deg")}")
    // absent when not requested
    store.runStage("nodeg", "fp-nodeg")(df)
    assert(store.maxDegreeOf("nodeg").isEmpty)

    // the SAMPLED path (stage rows above the injected exact bound): a
    // 50k-degree head key surfaces ~500 sampled rows, so the ×100
    // scale-up estimates it within a few percent — wide assertion bounds
    // cover sampling variance at the fixed seed
    val big = spark.range(100000L)
      .selectExpr("CASE WHEN id < 50000 THEN 'HEAD' ELSE concat('q', id) END AS id",
        "id AS v")
    val sStore = new graft.io.ManifestStore(spark,
      Files.createTempDirectory("graft-degree-s").toString,
      exactDegreeRows = 1000L)
    sStore.runStage("deg", "fp-deg-s", Nil, degreeOf = Some("id"))(big)
    val est = sStore.maxDegreeOf("deg").get
    assert(est >= 35000L && est <= 65000L,
      s"sampled head-degree estimate must land near 50k: $est")
  }

  test("snapshot isolation: a reader pinned to a snapshot survives a rerun") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-snap").toString
    val store = new graft.io.ManifestStore(spark, out)
    def commit(fp: String, rows: Seq[(Long, String)]): Unit =
      store.runStage("st", fp)(rows.toDF("k", "v"))

    commit("fp-v1", Seq((1L, "one"), (2L, "two")))
    val s1 = store.commitSnapshot()
    // reader pins snapshot 1 (plan built, not yet fully consumed)
    val pinned = store.snapshotTable(s1, "st")

    // a rerun with NEW inputs commits version 2 — in-place overwriting
    // would have deleted the files under the pinned reader mid-rerun
    commit("fp-v2", Seq((3L, "three")))
    val s2 = store.commitSnapshot()
    assert(store.listSnapshots().takeRight(2) == Seq(s1, s2).sorted.toSeq
      || store.listSnapshots().contains(s1))

    // the pinned reader still sees version 1, fully intact
    assert(pinned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(store.snapshotTable(s1, "st").collect().length == 2)
    // the new snapshot and the live manifest see version 2
    assert(store.snapshotTable(s2, "st").collect().map(_.getLong(0)).toSet == Set(3L))
    assert(store.dataDirOf("st").exists(_ != store.snapshotDataDirOf(s1, "st").get),
      "rerun must land in a NEW versioned dir")
    // unknown stage → explicit error
    intercept[IllegalArgumentException] { store.snapshotTable(s1, "nope") }

    // GC: keep only the newest snapshot → v1's dir and snapshot file go,
    // the live version and the kept snapshot stay readable
    commit("fp-v3", Seq((4L, "four")))
    val s3 = store.commitSnapshot()
    val (snapsGone, dirsGone) = store.gcSnapshots(keepSnapshots = 1)
    assert(snapsGone == 2 && dirsGone == 2,
      s"expected 2 snapshots + 2 version dirs collected: ($snapsGone, $dirsGone)")
    assert(store.listSnapshots() == Seq(s3))
    assert(store.snapshotTable(s3, "st").collect().map(_.getLong(0)).toSet == Set(4L))
    intercept[Exception] { store.snapshotTable(s1, "st").collect() }
  }

  test("pipeline run returns a committed snapshot id covering every stage") {
    val entities = Synth.entityDump(spark, nEnts)
    val properties = Synth.propertyDump(spark, mProps)
    val redirects = Synth.redirects(spark, nEnts)
    val transcripts = Synth.transcripts(spark, 8L, 4, nEnts, mProps)
    val outDir = Files.createTempDirectory("graft-runsnap").toString
    val res = KgPipeline.run(spark, transcripts, entities, properties,
      redirects, outDir)
    assert(res.snapshotId.nonEmpty)
    val store = new graft.io.ManifestStore(spark, outDir)
    for (st <- Seq("mentions", "triples", "edges", "canonical_map"))
      assert(store.snapshotDataDirOf(res.snapshotId, st).nonEmpty, st)
    // the pinned mentions read equals the live stage
    assert(store.snapshotTable(res.snapshotId, "triples").count() ==
      res.triples.count())
  }

  test("resume: second run reads every stage from manifests; outputs identical") {
    val entities = Synth.entityDump(spark, nEnts)
    val properties = Synth.propertyDump(spark, mProps)
    val redirects = Synth.redirects(spark, nEnts)
    val transcripts = Synth.transcripts(spark, 10L, 4, nEnts, mProps)
    val outDir = Files.createTempDirectory("graft-resume").toString

    val r1 = KgPipeline.run(spark, transcripts, entities, properties, redirects, outDir)
    val t1 = r1.triples.collect().map(_.toString).sorted
    val resumed1 = r1.metrics.select("stage", "resumed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(resumed1.values.forall(_ == false))

    val r2 = KgPipeline.run(spark, transcripts, entities, properties, redirects, outDir)
    val resumed2 = r2.metrics.select("stage", "resumed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(resumed2.values.forall(_ == true), s"not resumed: $resumed2")
    assert(r2.triples.collect().map(_.toString).sorted.sameElements(t1))

    // invalidate one mid-pipeline stage → only it recomputes, same rows
    // (via the store API: the numbered commit log is authoritative now, so
    // deleting the _MANIFEST.json mirror alone would NOT invalidate)
    new graft.io.ManifestStore(spark, outDir).invalidateStage("triples")
    val r3 = KgPipeline.run(spark, transcripts, entities, properties, redirects, outDir)
    val resumed3 = r3.metrics.select("stage", "resumed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(resumed3("triples") == false && resumed3("mentions") == true)
    assert(r3.triples.collect().map(_.toString).sorted.sameElements(t1))

    // a NEW inputVersion must invalidate every stage (the fingerprints
    // encode input identity, not just config — stale-resume guard)
    val r4 = KgPipeline.run(spark, transcripts, entities, properties, redirects,
      outDir, inputVersion = "v2")
    val resumed4 = r4.metrics.select("stage", "resumed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(resumed4.values.forall(_ == false), s"stale stages resumed: $resumed4")
  }

  test("pipeline over a TranscriptStore table == pipeline over the raw frame") {
    val entities = Synth.entityDump(spark, nEnts)
    val properties = Synth.propertyDump(spark, mProps)
    val redirects = Synth.redirects(spark, nEnts)
    val transcripts = Synth.transcripts(spark, 12L, 4, nEnts, mProps)

    val tableDir = Files.createTempDirectory("graft-ts-table").toString
    graft.io.TranscriptStore.write(transcripts, tableDir, nBuckets = 8)
    val fromTable = graft.io.TranscriptStore.read(spark, tableDir)
    // the conv_bucket partition column rides along; the pipeline must not care
    val r1 = KgPipeline.run(spark, fromTable, entities, properties, redirects,
      Files.createTempDirectory("graft-ts-out1").toString, inputVersion = "ts")
    val r2 = KgPipeline.run(spark, transcripts, entities, properties, redirects,
      Files.createTempDirectory("graft-ts-out2").toString, inputVersion = "raw")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(_.toString).sorted.toSeq
    assert(canon(r1.triples) == canon(r2.triples))
    assert(r1.triples.count() > 0)
  }

  test("standalone linkAndMaterialize: a changed dictVersion invalidates resume") {
    val entities = Synth.entityDump(spark, nEnts)
    val redirects = Synth.redirects(spark, nEnts)
    val transcripts = Synth.transcripts(spark, 8L, 4, nEnts, mProps)
    val properties = Synth.propertyDump(spark, mProps)
    val ei = graft.index.EntityIndexBuilder.build(entities)
    val pi = graft.index.PropertyIndexBuilder.build(properties)
    val dict = KgPipeline.dictionary(ei, entities, pi, properties)
    val outDir = Files.createTempDirectory("graft-dictver").toString

    def mentionsManifest(): String = Files.readString(
      Paths.get(outDir, "mentions", "_MANIFEST.json"))

    KgPipeline.linkAndMaterialize(spark, transcripts, entities, redirects,
      dict, ei, pi, outDir, dictVersion = "dict-v1")
    val m1 = mentionsManifest()
    // same dictVersion → resumes (manifest untouched, fingerprint stable)
    KgPipeline.linkAndMaterialize(spark, transcripts, entities, redirects,
      dict, ei, pi, outDir, dictVersion = "dict-v1")
    assert(mentionsManifest() == m1)
    // CHANGED dictVersion → every dictionary-derived stage recomputes (the
    // round-2 constant-"dict" fallback silently resumed stale mentions)
    KgPipeline.linkAndMaterialize(spark, transcripts, entities, redirects,
      dict, ei, pi, outDir, dictVersion = "dict-v2")
    assert(mentionsManifest() != m1, "new dictionary must invalidate mentions")
  }

  test("concurrent writers, same job: the loser adopts the winner's commit") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ccw-same").toString
    val store = new graft.io.ManifestStore(spark, out)
    // deterministic interleave: writer B's compute runs writer A's ENTIRE
    // runStage as a side effect, so A commits between B's version read and
    // B's commit — the exact window optimistic concurrency must handle
    var aResumed: Option[Boolean] = None
    val (bDf, bResumed) = store.runStage("st", "fp-x") {
      val (_, r) = store.runStage("st", "fp-x")(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      aResumed = Some(r)
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    }
    assert(aResumed.contains(false), "inner writer A must commit fresh")
    assert(bResumed, "B lost the version race on its own fingerprint -> adopt")
    assert(bDf.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(store.versionOf("st") == 1L, "one committed version, not two")
    assert(store.fingerprintOf("st").contains("fp-x"))
  }

  test("concurrent writers, different jobs: the loser aborts with a conflict") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ccw-diff").toString
    val store = new graft.io.ManifestStore(spark, out)
    val ex = intercept[graft.io.ConcurrentWriteException] {
      store.runStage("st", "fp-b") {
        store.runStage("st", "fp-a")(Seq((1L, "a")).toDF("k", "v"))
        Seq((9L, "z")).toDF("k", "v")
      }
    }
    assert(ex.getMessage.contains("fp-a") && ex.getMessage.contains("fp-b"))
    // the winner's commit is intact; the loser's orphan dir is GC-able
    assert(store.fingerprintOf("st").contains("fp-a"))
    assert(store.versionOf("st") == 1L)
    store.commitSnapshot()
    val (_, dirsGone) = store.gcSnapshots(keepSnapshots = 1)
    assert(dirsGone == 1, s"loser's orphan version dir collected: $dirsGone")
    assert(spark.read.parquet(s"$out/st/${store.dataDirOf("st").get}")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("schema evolution: additive commit ok, old snapshots read under the live schema") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-evolve").toString
    val store = new graft.io.ManifestStore(spark, out)
    store.runStage("st", "fp-v1")(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val snap1 = store.commitSnapshot()
    assert(store.schemaOf("st").exists(_.fieldNames.sameElements(Array("k", "v"))))
    // additive recommit: one new NULLABLE column
    store.runStage("st", "fp-v2")(
      Seq((3L, "c")).toDF("k", "v").withColumn("w", lit(null).cast("string")))
    assert(store.versionOf("st") == 2L)
    assert(store.schemaOf("st").exists(_.fieldNames.sameElements(Array("k", "v", "w"))))
    // the pinned PRE-evolution snapshot evolves to the live schema: w nulls
    val evolved = store.snapshotTable(snap1, "st", evolveToCurrent = true)
    assert(evolved.schema.fieldNames.sameElements(Array("k", "v", "w")))
    assert(evolved.count() == 2 && evolved.filter(col("w").isNull).count() == 2)
    // raw pinned read unchanged; version time travel reaches both commits
    assert(store.snapshotTable(snap1, "st", evolveToCurrent = false)
      .schema.fieldNames.sameElements(Array("k", "v")))
    assert(store.tableAsOfVersion("st", 1L).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(store.tableAsOfVersion("st", 2L).collect().map(_.getLong(0)).toSet == Set(3L))
    intercept[IllegalArgumentException] { store.tableAsOfVersion("st", 3L) }
  }

  test("schema evolution: drops, retypes and non-nullable adds are refused") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-evolve-bad").toString
    val store = new graft.io.ManifestStore(spark, out)
    store.runStage("st", "fp-v1")(Seq((1L, "a")).toDF("k", "v"))
    val dropped = intercept[graft.io.SchemaEvolutionException] {
      store.runStage("st", "fp-drop")(Seq(Tuple1(2L)).toDF("k"))
    }
    assert(dropped.getMessage.contains("'v' dropped"))
    val retyped = intercept[graft.io.SchemaEvolutionException] {
      store.runStage("st", "fp-retype")(Seq((2L, 5L)).toDF("k", "v"))
    }
    assert(retyped.getMessage.contains("retyped"))
    val nonNull = intercept[graft.io.SchemaEvolutionException] {
      store.runStage("st", "fp-nn")(
        Seq((2L, "b")).toDF("k", "v").withColumn("w", lit(7L)))
    }
    assert(nonNull.getMessage.contains("must be nullable"))
    // failed commits consume no version and leave no visible data
    assert(store.versionOf("st") == 1L)
    assert(store.fingerprintOf("st").contains("fp-v1"))
  }
}
