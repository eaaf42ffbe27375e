package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curate, Decontam, Scrub, TextAnalysis}

/** Unit checks for the round-5 corpus-prep ops (repetition signals, token
  * windows, PII scrub, domain-mix sampling, train/eval decontamination) on
  * hand-computed inputs; their corpus-scale behavior is oracle-checked via
  * the driver queries (`rep_signals`, `chunk_windows`, `pii_scrub`,
  * `domain_mix`, `decontam_overlap`).
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("repSignals: hand-computed repetition fractions") {
    // "a a a b": 4 tokens, 2 distinct, top unigram 'a'×3, top bigram "a a"×2 of 3
    val out = TextAnalysis.repSignals(docs(1L -> "a a a b"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_tokens") == 4L)
    assert(out.getAs[Long]("n_distinct") == 2L)
    assert(out.getAs[Long]("dup_token_milli") == 500L) // (4-2)*1000/4
    assert(out.getAs[Long]("top_unigram_milli") == 750L) // 3*1000/4
    assert(out.getAs[Long]("top_bigram_milli") == 1000L) // 2*2000/4
  }

  test("repSignals: empty and single-token documents do not divide by zero") {
    val out = TextAnalysis.repSignals(docs(1L -> "", 2L -> "only"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") == 0L)
    assert(out(0).getAs[Long]("dup_token_milli") == 0L)
    assert(out(1).getAs[Long]("n_tokens") == 1L)
    assert(out(1).getAs[Long]("top_bigram_milli") == 0L)
  }

  test("repetitionFilter: keeps natural text, drops degenerate repetition") {
    val out = TextAnalysis.repetitionFilter(
        docs(1L -> "the quick brown fox jumps over the lazy dog",
             2L -> "spam spam spam spam spam spam spam spam"),
        "doc_id", "text")
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) && !out(2L))
  }

  test("tokenWindows: window content, stride overlap, tail and empty doc") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.tokenWindows(docs(1L -> text, 2L -> ""), "doc_id", "text",
        window = 16, stride = 12)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: ceil(20/12) = 2 windows — [w1..w16] and [w13..w20]; doc 2: none
    assert(out.length == 2 && out.forall(_.getLong(0) == 1L))
    assert(out(0).getAs[Long]("chunk_tokens") == 16L)
    assert(out(1).getAs[Long]("chunk_tokens") == 8L)
    val expFp0 = spark.range(1).select(
      TextAnalysis.fingerprint(lit((1 to 16).map(i => s"w$i").mkString(" ")))).collect()(0).getLong(0)
    val expFp1 = spark.range(1).select(
      TextAnalysis.fingerprint(lit((13 to 20).map(i => s"w$i").mkString(" ")))).collect()(0).getLong(0)
    assert(out(0).getAs[Long]("chunk_fp") == expFp0)
    assert(out(1).getAs[Long]("chunk_fp") == expFp1)
  }

  test("scrub: counts and redacted bytes on planted PII") {
    val out = Scrub.pii(
        docs(1L -> "mail bob.smith@corp.example.org or 192.168.0.1 or 555-1234 end",
             2L -> "clean text with numbers 12 and 3.14 only"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 1L)
    assert(out(0).getAs[Long]("n_ipv4") == 1L)
    assert(out(0).getAs[Long]("n_phones") == 1L)
    assert(out(0).getAs[String]("redacted") == "mail <EMAIL> or <IP> or <PHONE> end")
    assert(out(1).getAs[Long]("n_emails") == 0L)
    assert(out(1).getAs[String]("redacted") == "clean text with numbers 12 and 3.14 only")
  }

  test("scrub: fixed redaction order — email absorbs its embedded IP first") {
    // the email's host CONTAINS a dotted quad; email redacts first so the
    // quad never survives to the ip pass (any other order would emit a@<IP>…)
    val out = Scrub.pii(docs(1L -> "x user@10.0.0.1.example.com y"), "doc_id", "text")
      .collect().head
    assert(out.getAs[String]("redacted") == "x <EMAIL> y")
    assert(out.getAs[Long]("n_ipv4") == 1L) // counting sees it; order resolves it
  }

  test("domainTag: rate 0 keeps nothing, rate 10000 keeps everything, deterministic") {
    val df = docs((0L until 200L).map(i => i -> s"doc $i"): _*)
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(4))))
    val tagged = Curate.domainTag(df, "doc_id", "source",
      rates = Seq("src0" -> 10000, "src1" -> 0), defaultBp = 5000)
    val bySrc = tagged.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("src0") == ((50L, 50L)))
    assert(bySrc("src1") == ((50L, 0L)))
    val mid = bySrc("src2")._2 + bySrc("src3")._2
    assert(mid > 20L && mid < 80L, s"~50% expected of 100 at 5000bp, got $mid")
    val again = Curate.domainSample(df, "doc_id", "source",
      rates = Seq("src0" -> 10000, "src1" -> 0), defaultBp = 5000).count()
    assert(again == 50L + mid)
  }

  test("splitCol: mixed-wrap hash reaches all three splits at small id counts") {
    val df = docs((0L until 500L).map(i => i -> "t"): _*)
      .withColumn("split", Curate.splitCol(col("doc_id"), 9000, 500))
    val dist = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the pre-fix affine form (×1000003 straight mod 10000) degenerates to
    // ×3 on small integer ids and yields a 98/2/0 split — no test rows at all
    assert(dist.getOrElse("test", 0L) > 0L, s"test split empty: $dist")
    assert(dist.getOrElse("val", 0L) > 0L)
    assert(dist("train") > 350L && dist("train") < 490L, s"train share off: $dist")
  }

  test("decontam: shared shingles flagged, df cap drops boilerplate") {
    val evalSet = docs(
      100L -> "the secret benchmark answer is forty two exactly",
      101L -> "common header common header common header common header")
    val corpus = docs(
      1L -> "leaked copy the secret benchmark answer is forty two exactly end",
      2L -> "totally unrelated words about weather patterns in spring time",
      3L -> "common header common header common header common header trailer")
    val out = Decontam.overlap(corpus, evalSet, "doc_id", "text", n = 5, maxEvalDf = 1000L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(out.contains(1L) && out(1L) >= 4L, s"leaked doc not flagged: $out")
    assert(!out.contains(2L))
    assert(out.contains(3L))
    // cap at 0 drops every eval shingle -> nothing flagged
    val capped = Decontam.overlap(corpus, evalSet, "doc_id", "text", n = 5, maxEvalDf = 0L)
    assert(capped.count() == 0L)
  }

  test("packSequences: hand-computed piece geometry at budget 10") {
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // token counts 4, 0, 9, 12, 15 -> starts 0, -, 4, 13, 25; 40 tokens total
    val out = Curate.packSequences(
        docs(1L -> toks(4), 2L -> "", 3L -> toks(9), 4L -> toks(12), 5L -> toks(15)),
        "doc_id", "text", budget = 10L)
      .orderBy("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, 4L),              // doc 1 fits in seq 0 at offset 0
      (3L, 0L, 0L, 4L, 6L), (3L, 1L, 6L, 0L, 3L),   // doc 3 straddles 0|1
      (4L, 1L, 0L, 3L, 7L), (4L, 2L, 7L, 0L, 5L),   // doc 4 straddles 1|2
      (5L, 2L, 0L, 5L, 5L), (5L, 3L, 5L, 0L, 10L))) // doc 5 ends exactly at 40
  }

  test("packSequences: invariants — full sequences, conserved tokens, bucket-count invariance") {
    import spark.implicits._
    // sparse non-contiguous ids not starting at 0, varied lengths incl. empties
    val df = docs((0 until 300).map { i =>
      (1000L + i * 7L) -> (if (i % 11 == 0) "" else (1 to (i % 37) + 1).map(j => s"w$j").mkString(" "))
    }: _*)
    val out = Curate.packSequences(df, "doc_id", "text", budget = 64L).cache()
    val totalTokens = df.select(sum(size(filter(split(col("text"), " "),
      t => length(t) > 0)))).as[Long].head()
    assert(out.agg(sum("piece_len")).as[Long].head() == totalTokens)
    // every sequence except the last holds exactly the budget
    val perSeq = out.groupBy("seq_id").agg(sum("piece_len").as("n"))
      .orderBy("seq_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(perSeq.map(_._1).toSeq == (0L until perSeq.length).toSeq)
    assert(perSeq.dropRight(1).forall(_._2 == 64L), s"non-full interior seq: ${perSeq.toSeq}")
    assert(perSeq.last._2 <= 64L && perSeq.last._2 > 0L)
    // piece geometry stays inside the sequence budget
    assert(out.filter(col("seq_off") + col("piece_len") > 64L || col("piece_len") <= 0L).count() == 0L)
    // the two-level prefix sum is independent of the bucket count
    val one = Curate.packSequences(df, "doc_id", "text", budget = 64L, nBuckets = 1)
    val many = Curate.packSequences(df, "doc_id", "text", budget = 64L, nBuckets = 17)
    assert(one.except(out).count() == 0L && out.except(one).count() == 0L)
    assert(many.except(out).count() == 0L && out.except(many).count() == 0L)
    out.unpersist()
  }

  test("lengthQuantiles: hand-computed ceil-rank quantiles per domain") {
    import spark.implicits._
    // domain A lengths 1,2,3,4; domain B lengths 0,0,5 (empties count)
    val df = Seq(
      ("A", "w"), ("A", "w w"), ("A", "w w w"), ("A", "w w w w"),
      ("B", ""), ("B", ""), ("B", "a b c d e")).toDF("source", "text")
    val out = TextAnalysis.lengthQuantiles(df, "text", "source",
        qMilli = Seq(250, 500, 750, 1000))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("A", 250L)) == ((4L, 1L)))  // rank ceil(.25*4)=1 -> value 1
    assert(out(("A", 500L)) == ((4L, 2L)))
    assert(out(("A", 750L)) == ((4L, 3L)))
    assert(out(("A", 1000L)) == ((4L, 4L)))
    assert(out(("B", 500L)) == ((3L, 0L)))  // median of (0,0,5) is 0
    assert(out(("B", 1000L)) == ((3L, 5L)))
    assert(out.size == 8)
  }

  test("lengthQuantiles: rejects out-of-range quantiles; single-length domain is constant") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      TextAnalysis.lengthQuantiles(
        Seq(("A", "w")).toDF("source", "text"), "text", "source", Seq(0))
    }
    val out = TextAnalysis.lengthQuantiles(
        Seq.fill(9)(("A", "x y z")).toDF("source", "text"),
        "text", "source", Seq(100, 500, 999))
      .select("value").as[Long].collect()
    assert(out.toSeq == Seq(3L, 3L, 3L))
  }

  test("shufflePositions: dense permutation, seed-sensitive, deterministic, bucket-invariant") {
    import spark.implicits._
    val df = docs((0 until 400).map(i => (i * 13L + 5L) -> "x"): _*)
    val pos = Curate.shufflePositions(df, "doc_id", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // dense permutation of 0..n-1
    assert(pos.map(_._2).sorted.toSeq == (0L until 400L).toSeq)
    // not the identity-ish storage order (a broken hash would rank by id)
    val byId = pos.sortBy(_._1).map(_._2)
    assert(byId.zip(byId.tail).count { case (a, b) => a < b } < 300,
      "shuffled order tracks storage order too closely")
    // deterministic under recompute; a different seed permutes differently
    val again = Curate.shufflePositions(df, "doc_id", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(pos.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val other = Curate.shufflePositions(df, "doc_id", seed = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(other.map(_._2).toSeq != pos.sortBy(_._1).map(_._2).toSeq)
    // two-level rank is independent of the bucket count
    val one = Curate.shufflePositions(df, "doc_id", seed = 7L, nBuckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(one.toSeq == pos.sortBy(_._1).toSeq)
  }

  test("shufflePositions composes with packSequences: pack in shuffled order") {
    val df = docs((0 until 60).map(i => i.toLong -> (1 to (i % 9) + 1).map(j => s"w$j").mkString(" ")): _*)
    val shuffled = Curate.shufflePositions(df, "doc_id", seed = 3L)
    val packed = Curate.packSequences(
      df.join(shuffled, "doc_id").select(col("shuffle_pos"), col("text")),
      "shuffle_pos", "text", budget = 32L)
    import spark.implicits._
    val total = df.select(sum(size(filter(split(col("text"), " "),
      t => length(t) > 0)))).as[Long].head()
    assert(packed.agg(sum("piece_len")).as[Long].head() == total)
    val perSeq = packed.groupBy("seq_id").agg(sum("piece_len").as("n"))
      .orderBy("seq_id").collect().map(_.getLong(1))
    assert(perSeq.dropRight(1).forall(_ == 32L))
  }

  test("packSequences: negative ids bucket correctly; over-Long range is rejected") {
    // ids straddling zero: lo < 0 exercises the (id - lo) rebase path
    val df = docs((-50 until 50).map(i => i.toLong -> (1 to 3).map(j => s"w$j").mkString(" ")): _*)
    val out = Curate.packSequences(df, "doc_id", "text", budget = 7L, nBuckets = 8)
    import spark.implicits._
    assert(out.agg(sum("piece_len")).as[Long].head() == 300L)
    val perSeq = out.groupBy("seq_id").agg(sum("piece_len").as("n"))
      .orderBy("seq_id").collect().map(_.getLong(1))
    assert(perSeq.dropRight(1).forall(_ == 7L))
    // a range wider than Long must fail loudly, never mis-bucket
    val wide = docs(Long.MinValue + 1 -> "a", Long.MaxValue - 1 -> "b")
    val e = intercept[IllegalArgumentException] {
      Curate.packSequences(wide, "doc_id", "text", budget = 7L)
    }
    assert(e.getMessage.contains("renumber"))
  }

  test("packSequences: empty input and all-empty documents yield no pieces") {
    assert(Curate.packSequences(docs(), "doc_id", "text", budget = 8L).count() == 0L)
    assert(Curate.packSequences(docs(1L -> "", 2L -> ""), "doc_id", "text",
      budget = 8L).count() == 0L)
  }

  test("decontam: contam_milli is shared/total per-mille of the train doc") {
    val evalSet = docs(100L -> "one two three four five")
    val corpus = docs(1L -> "one two three four five six seven eight nine")
    // train doc: 5 shingles of 5-grams over 9 tokens; exactly 1 shared
    val out = Decontam.overlap(corpus, evalSet, "doc_id", "text", n = 5).collect().head
    assert(out.getAs[Long]("n_shingles") == 5L)
    assert(out.getAs[Long]("n_shared") == 1L)
    assert(out.getAs[Long]("contam_milli") == 200L)
  }

  test("wordFrequencies: exact counts, minCount prunes the tail") {
    val d = docs(1L -> "the cat  the dog", 2L -> "the cat", 3L -> "")
    val all = TextAnalysis.wordFrequencies(d, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("the" -> 3L, "cat" -> 2L, "dog" -> 1L),
      s"double space must not create empty tokens: $all")
    val pruned = TextAnalysis.wordFrequencies(d, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned == Map("the" -> 3L, "cat" -> 2L))
  }

  test("bpePairCounts: frequency-weighted pairs, in-word repeats, ties, topK") {
    // vocab: "aaa"×2 (pairs aa, aa — counted twice per occurrence),
    // "ab"×3 (pair ab), "ba"×3 (pair ba), "x"×5 (no pair)
    val d = docs(
      1L -> "aaa ab ba x x", 2L -> "aaa ab ba x x", 3L -> "ab ba x")
    val got = TextAnalysis.bpePairCounts(d, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // aa: 2 per "aaa" × 2 occurrences = 4; ab: 3; ba: 3 (tie -> "ab" first)
    assert(got.toSeq == Seq(("aa", 4L), ("ab", 3L), ("ba", 3L)))
    val top1 = TextAnalysis.bpePairCounts(d, "text", topK = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top1.toSeq == Seq(("aa", 4L)))
  }

  test("bpePairCounts: top-k plans as TakeOrderedAndProject, never a global sort") {
    val out = TextAnalysis.bpePairCounts(docs(1L -> "ab cd ab"), "text", topK = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded per-partition heap + driver merge:\n$plan")
    assert(!plan.contains("GlobalSort") && !out.queryExecution.executedPlan.exists {
      case s: org.apache.spark.sql.execution.SortExec => s.global
      case _ => false
    }, s"no global sort allowed in the top-k plan:\n$plan")
  }
}
