package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Mentions, SaltedAgg, Triples}

class MentionTripleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def dict(rows: (String, String, Boolean, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("surface", "id", "is_prop", "weight")
      .withColumn("kind", org.apache.spark.sql.functions.lit(0))
  }

  def turns(rows: (String, Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("conv_id", "turn_idx", "text")
  }

  test("longest-match dominance: bigram beats contained unigrams") {
    val d = dict(
      ("new york", "Q60", false, 100L),
      ("york", "Q100", false, 10L),
      ("new", "Q200", false, 5L))
    val t = turns(("c1", 0, "i love new york a lot"))
    val got = Mentions.detect(t, d)
      .collect().map(r => (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
        r.getAs[String]("id"))).toSet
    assert(got == Set((2, 4, "Q60")))
  }

  test("non-overlapping matches all survive; property+entity spans coexist") {
    val d = dict(
      ("paris", "Q90", false, 50L),
      ("borders", "P47", true, 20L),
      ("berlin", "Q64", false, 40L))
    val t = turns(("c1", 0, "paris borders berlin today"))
    val got = Mentions.detect(t, d)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[Boolean]("is_prop"))).toSet
    assert(got == Set(("Q90", false), ("P47", true), ("Q64", false)))
  }

  test("triple extraction: subj before pred (with previous-turn fallback), obj after in same turn") {
    val d = dict(
      ("paris", "Q90", false, 50L),
      ("borders", "P47", true, 20L),
      ("berlin", "Q64", false, 40L),
      ("tokyo", "Q1490", false, 30L))
    val t = turns(
      ("c1", 0, "paris borders berlin"),
      ("c1", 1, "it also borders tokyo"), // subj falls back to last entity: berlin
      ("c1", 2, "borders tokyo"), // subj = tokyo (turn 1), obj = tokyo
      ("c2", 0, "borders paris")) // no previous entity → no triple
    val mentions = Mentions.detect(t, d)
    val got = Triples.extract(mentions)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))).toSet
    assert(got == Set(
      ("Q90", "P47", "Q64", "c1", 0),
      ("Q64", "P47", "Q1490", "c1", 1),
      ("Q1490", "P47", "Q1490", "c1", 2)))
  }

  test("extractFast (single pass) == extract (windows) on synth mentions") {
    val ents = graft.synth.Synth.entityDump(spark, 200)
    val props = graft.synth.Synth.propertyDump(spark, 20)
    val dict = graft.pipeline.KgPipeline.dictionary(
      graft.index.EntityIndexBuilder.build(ents), ents,
      graft.index.PropertyIndexBuilder.build(props), props)
    val mentions = Mentions.detectFast(
      graft.synth.Synth.transcripts(spark, 30, 6, 200, 20), dict)
    def c(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("subj", "pred", "obj", "conv_id", "turn_idx", "round(score, 6) AS s")
      .collect().map(_.toString).sorted.toSeq
    val a = c(Triples.extract(mentions))
    val b = c(Triples.extractFast(mentions))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("salted aggregation == plain aggregation (skewed keys)") {
    import spark.implicits._
    val rows = (1 to 2000).map { i =>
      val id = if (i % 3 == 0) "HEAD" else s"Q${i % 50}"
      (id, i.toDouble / 10, s"c${i % 97}", i % 20, i % 7)
    }
    val df = rows.toDF("id", "score", "conv_id", "turn_idx", "span_start")
    val salted = SaltedAgg.linkScores(df, saltN = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1000)))
      .toSet
    val plain = df.groupBy("id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("score").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1000)))
      .toSet
    assert(salted == plain)
  }

  test("link-score salt gates on HEAD DEGREE; forced saltN is authoritative") {
    import spark.implicits._
    val rows = (1 to 2000).map { i =>
      val id = if (i % 3 == 0) "HEAD" else s"Q${i % 50}"
      (id, i.toDouble / 10, s"c${i % 97}", i % 20, i % 7)
    }
    val df = rows.toDF("id", "score", "conv_id", "turn_idx", "span_start")
    def exchanges(out: org.apache.spark.sql.DataFrame): Int = {
      out.collect() // AQE finalizes the plan on execution
      // count the FINAL adaptive plan only (the rendering repeats every
      // Exchange in its "Initial Plan" section)
      out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
        .split("\n").count(_.contains("Exchange hashpartitioning"))
    }
    // AUTO + sub-threshold head degree → the salt degenerates: ONE exchange
    val gated = SaltedAgg.linkScores(df, maxDegreeHint = Some(4000L))
    assert(exchanges(gated) == 1, "gated-off salt must be single-phase")
    // AUTO + a Zipf-head degree → the two-phase salted shape engages
    val engaged = SaltedAgg.linkScores(df, maxDegreeHint = Some(5000000L))
    assert(exchanges(engaged) == 2, "head-degree hint must engage the salt")
    assert(exchanges(SaltedAgg.linkScores(df)) == 2,
      "no hint stays conservatively salted")
    // a caller-FORCED saltN is authoritative: the hint never overrides it
    // (the round-4 gate silently disabled an explicit fan-out — ADVICE r04)
    assert(exchanges(SaltedAgg.linkScores(df, saltN = 8,
      maxDegreeHint = Some(4L))) == 2, "forced saltN must win over the hint")
    // both physical shapes, same result
    def res(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1000))).toSet
    assert(res(gated) == res(engaged))
  }

  test("detectFast (broadcast trie scan) == detect (Catalyst) on synth corpus") {
    val spark2 = spark
    val ents = graft.synth.Synth.entityDump(spark2, 300)
    val props = graft.synth.Synth.propertyDump(spark2, 30)
    val ei = graft.index.EntityIndexBuilder.build(ents)
    val pi = graft.index.PropertyIndexBuilder.build(props)
    val dict = graft.pipeline.KgPipeline.dictionary(ei, ents, pi, props)
    val turns = graft.synth.Synth.transcripts(spark2, 40, 6, 300, 30)
    def collectM(df: org.apache.spark.sql.DataFrame) =
      df.select("conv_id", "turn_idx", "span_start", "span_end", "surface", "id",
        "kind", "is_prop", "score")
        .collect().map(_.toString).toSet
    val a = collectM(Mentions.detect(turns, dict))
    val b = collectM(Mentions.detectFast(turns, dict))
    assert(a == b, s"only-catalyst=${(a -- b).take(5)} only-fast=${(b -- a).take(5)}")
    assert(a.nonEmpty)
  }

  test("dictionary-size guard: shuffle-join path == broadcast trie path") {
    val ents = graft.synth.Synth.entityDump(spark, 250)
    val props = graft.synth.Synth.propertyDump(spark, 25)
    val dict = graft.pipeline.KgPipeline.dictionary(
      graft.index.EntityIndexBuilder.build(ents), ents,
      graft.index.PropertyIndexBuilder.build(props), props)
    val turns = graft.synth.Synth.transcripts(spark, 25, 5, 250, 25)
    def collectM(df: org.apache.spark.sql.DataFrame) =
      df.select("conv_id", "turn_idx", "span_start", "span_end", "surface", "id",
        "kind", "is_prop", "score")
        .collect().map(_.toString).toSet
    // force the guard BOTH ways: threshold 0 → shuffle join, huge → trie scan
    val viaShuffle = collectM(Mentions.detectAuto(turns, dict, broadcastMaxRows = 0L))
    val viaTrie = collectM(Mentions.detectAuto(turns, dict, broadcastMaxRows = Long.MaxValue))
    assert(viaShuffle == viaTrie,
      s"only-shuffle=${(viaShuffle -- viaTrie).take(5)} only-trie=${(viaTrie -- viaShuffle).take(5)}")
    assert(viaTrie.nonEmpty)
  }

  test("detectTracked leaves no cached blocks after materialize + release") {
    val d = dict(
      ("paris", "Q90", false, 50L),
      ("borders", "P47", true, 20L),
      ("berlin", "Q64", false, 40L))
    val t = turns(("c1", 0, "paris borders berlin today"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (df, caches) = Mentions.detectTracked(t, d)
    assert(df.count() == 3)
    caches.foreach(_.unpersist(blocking = true))
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"detect-and-materialize cycle leaked cached RDDs: ${after -- before}")
  }

  test("detectAutoTracked with a row-count hint runs no dictionary count job") {
    val d = dict(("paris", "Q90", false, 50L))
    val t = turns(("c1", 0, "paris is nice"))
    // hint below the broadcast bound → trie path, zero extra jobs over dict
    val (fast, c1) = Mentions.detectAutoTracked(t, d, knownDictRows = Some(1L))
    assert(c1.isEmpty && fast.count() == 1)
    // hint above the bound → shuffle join, caches returned for release
    val (slow, c2) = Mentions.detectAutoTracked(t, d,
      broadcastMaxRows = 0L, knownDictRows = Some(1L))
    assert(slow.count() == 1)
    c2.foreach(_.unpersist(blocking = false))
  }

  test("co-reference edges link distinct ids sharing a base surface") {
    import spark.implicits._
    val mentions = Seq(
      // conversation c1 mentions the plain and the disambiguated entity
      ("c1", 0, 0, 1, "springfield", "Q1", 0, false, 1.0, "springfield"),
      ("c1", 1, 0, 2, "springfield (illinois)", "Q2", 1, false, 1.0, "springfield"),
      ("c1", 1, 3, 4, "rome", "Q9", 0, false, 1.0, "rome"),
      // same base in another conversation — separate group, single id → no edge
      ("c2", 0, 0, 1, "springfield", "Q1", 0, false, 1.0, "springfield"),
      // property mentions never produce co-reference edges
      ("c1", 2, 0, 1, "springfield", "P5", 0, true, 1.0, "springfield"))
      .toDF("conv_id", "turn_idx", "span_start", "span_end", "surface", "id",
        "kind", "is_prop", "score", "base")
    val redirects = Seq(("Q7", Seq("Q8"))).toDF("qid", "redirects")
    val got = graft.pipeline.KgPipeline.coreferenceEdges(mentions, redirects)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("Q7", "Q8"), ("Q2", "Q1")))
  }

  test("rendered surface collisions resolve by kind priority") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same rendered surface "apple (fruit)": a LabelInfo entry and an
    // AliasInfo entry → Label wins
    val idx = Seq(
      ("apple", Some("fruit"), "Q1", 1),
      ("apple", Some("fruit2"), "Q3", 1),
      ("apple (fruit)", None: Option[String], "Q2", 3))
      .toDF("surface", "info", "id", "kind")
    val got = Mentions.renderSurfaces(idx, isProp = false)
      .select("surface", "id", "base")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("apple (fruit)", "Q1", "apple"), ("apple (fruit2)", "Q3", "apple")))
  }

  test("richLabels synth: near-unique labels still round-trip scan -> triples") {
    val n = 2000L
    // 2-token vocab collapses onto <= 1,073 labels at n=2000; the rich
    // 4-token vocab must keep label cardinality near n (birthday-rate
    // collisions only)
    val rich = graft.synth.Synth.entityDump(spark, n, richLabels = true)
    val flat = graft.synth.Synth.entityDump(spark, n)
    val richDistinct = rich.select("label").distinct().count()
    val flatDistinct = flat.select("label").distinct().count()
    assert(flatDistinct <= 1073L)
    assert(richDistinct > n * 9 / 10, s"rich labels collapsed: $richDistinct of $n")
    // and the 4-token surfaces still match end-to-end: dictionary built from
    // the rich dump finds the planted surfaces in rich transcripts (maxN=4)
    val props = graft.synth.Synth.propertyDump(spark, 20)
    val dict = graft.pipeline.KgPipeline.dictionary(
      graft.index.EntityIndexBuilder.build(rich), rich,
      graft.index.PropertyIndexBuilder.build(props), props)
    val turns = graft.synth.Synth.transcripts(spark, 30, 6, n, 20, richLabels = true)
    val triples = Triples.extractFast(Mentions.detectFast(turns, dict))
    assert(triples.count() > 0)
  }
}
