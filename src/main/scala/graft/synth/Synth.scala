package graft.synth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully distributed synthesizer (FIXTURES.md) — every column
  * is a pure function of `spark.range` ids (no RNG, no driver-side loops), so
  * the same (scale, seed-constants) always produce identical tables at any
  * parallelism. Plants the hazards the index cascade and the linker must
  * handle: label collisions, shared vs unique aliases, entities whose label is
  * another entity's popular alias, Zipf-ish popularity for skew/salting tests.
  */
object Synth {

  val adjectives: Seq[String] = Seq(
    "amber", "brisk", "cobalt", "dusky", "eager", "feral", "gilded", "hollow",
    "ivory", "jagged", "keen", "lucid", "mellow", "noble", "opal", "pale",
    "quiet", "rustic", "sable", "tidal", "umber", "vivid", "wry", "young",
    "zesty", "arid", "bold", "crisp", "deep", "early", "fabled", "grand",
    "humble", "inner", "jovial", "kindred", "lone")

  val nouns: Seq[String] = Seq(
    "falcon", "harbor", "lantern", "meadow", "orchid", "prairie", "quarry",
    "ridge", "summit", "thicket", "valley", "willow", "anchor", "beacon",
    "cavern", "delta", "ember", "fjord", "glacier", "haven", "isle", "jetty",
    "knoll", "lagoon", "mesa", "nexus", "oasis", "pylon", "quay")

  val verbs: Seq[String] = Seq(
    "borders", "contains", "supplies", "precedes", "mirrors", "anchors",
    "links", "feeds", "guards", "shadows", "rivals", "echoes", "frames")

  val fillers: Seq[String] = Seq(
    "indeed", "notably", "reportedly", "meanwhile", "curiously", "formally",
    "roughly", "nearby", "historically", "apparently")

  private def pick(words: Seq[String], idx: Column): Column =
    element_at(typedlit(words), (pmod(idx, lit(words.size)) + 1).cast("int"))

  /** label(i): adjective–noun pair; the pools are smaller than typical n so
    * distinct entities collide on labels (exercises E2–E4).
    */
  def entLabel(i: Column): Column =
    concat(pick(adjectives, i * 7 + 3), lit(" "), pick(nouns, i * 11 + 1))

  /** Exact integer division of a long Column (no double rounding). */
  private def idiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  /** Rich-vocabulary label (r5): a 4-token adjective–noun–adjective–noun
    * composition. The trailing pair indexes on `i div 37` / `i div 29` —
    * NOT another affine map of i, which would stay a function of the same
    * residues and collapse back onto 1,073 strings — so by CRT the 4-token
    * label is injective in i up to 37²·29² ≈ 1.15M and label cardinality
    * scales with n. At 10^6 entities the 2-token vocab funnels base-surface
    * co-reference into ~1,073 giant components (great skew stress,
    * unrealistic shape — FIXTURES.md); this variant gives the REALISTIC
    * regime: unique labels below ~1.15M entities, component sizes driven by
    * actual cross-conversation entity reuse. Opt-in via the `richLabels`
    * flags — the cascade tests keep the 2-token hazard rates.
    */
  def entLabelRich(i: Column): Column =
    concat(pick(adjectives, i * 7 + 3), lit(" "), pick(nouns, i * 11 + 1),
      lit(" "), pick(adjectives, idiv(i, 37) * 13 + 5),
      lit(" "), pick(nouns, idiv(i, 29) * 19 + 2))

  /** The label function the `richLabels` flag selects. Dump and transcripts
    * MUST agree (same flag value) or transcript surfaces stop matching the
    * dictionary; both default to the 2-token hazard vocab.
    */
  private def labelFn(richLabels: Boolean): Column => Column =
    if (richLabels) entLabelRich else entLabel

  def propLabel(i: Column): Column =
    concat(pick(verbs, i * 5 + 2),
      when(pmod(i, lit(4)) === 0, concat(lit(" "), pick(fillers, i * 3))).otherwise(lit("")))

  /** Zipf-ish popularity via a multiplicative-hash permutation of ranks. */
  def zipfCount(i: Column, n: Long): Column =
    (lit(n) * 5L / (pmod(i * lit(2654435761L), lit(n)) + 1L) + 1L).cast("long")

  /** Entity dump at the canonical schema
    * `(qid, label, desc, count, types, aliases, seq)`.
    * Planted: ~1/3 of entities alias ANOTHER entity's label ("aka" alias →
    * popular-alias override, `kg-entities.rs:158-175`), 1/4 carry a unique
    * alias, first n/50 ids serve as type entities (J2).
    */
  def entityDump(spark: SparkSession, n: Long, richLabels: Boolean = false): DataFrame = {
    val lbl = labelFn(richLabels)
    val t = math.max(1L, n / 50)
    spark.range(n)
      .withColumn("qid", concat(lit("Q"), col("id") + 1))
      .withColumn("label", lbl(col("id")))
      .withColumn("desc",
        when(pmod(col("id"), lit(10)) === 9, lit(""))
          .otherwise(concat(lit("kind-"), pmod(col("id"), lit(7)))))
      .withColumn("count", zipfCount(col("id"), n))
      .withColumn("types",
        when(col("id") < t, array().cast("array<string>"))
          .otherwise(array(concat(lit("Q"), pmod(col("id") * 3, lit(t)) + 1))))
      .withColumn("aliases",
        filter(
          array(
            when(pmod(col("id"), lit(3)) === 0, lbl(pmod(col("id") * 5 + 1, lit(n)))),
            when(pmod(col("id"), lit(4)) === 0, concat(lit("codename "), col("qid")))),
          x => x.isNotNull))
      .withColumn("seq", col("id"))
      .select("qid", "label", "desc", "count", "types", "aliases", "seq")
  }

  /** Property dump at `(pid, label, count, aliases, inverses, seq)`.
    * Planted: label collisions with count ties (A5), unique + shared aliases
    * (A6/A7), inverse pairs (S8).
    */
  def propertyDump(spark: SparkSession, m: Long): DataFrame =
    spark.range(m)
      .withColumn("pid", concat(lit("P"), col("id") + 1))
      .withColumn("label", propLabel(col("id")))
      .withColumn("count", zipfCount(col("id") * 3 + 1, math.max(m, 2)))
      .withColumn("aliases",
        filter(
          array(
            when(pmod(col("id"), lit(2)) === 0, concat(lit("rel "), col("pid"))),
            when(pmod(col("id"), lit(5)) === 0, pick(verbs, col("id") * 7))),
          x => x.isNotNull))
      .withColumn("inverses",
        when(pmod(col("id"), lit(6)) === 0,
          array(concat(lit("P"), pmod(col("id") + 3, lit(m)) + 1)))
          .otherwise(array().cast("array<string>")))
      .withColumn("seq", col("id"))
      .select("pid", "label", "count", "aliases", "inverses", "seq")

  /** Redirects: every 20th entity redirects to the next one. */
  def redirects(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .filter(pmod(col("id"), lit(20)) === 7)
      .select(
        concat(lit("Q"), col("id") + 1).as("qid"),
        array(concat(lit("Q"), pmod(col("id") + 1, lit(n)) + 1)).as("redirects"))

  /** Transcript table at the BASELINE.json input_hint schema. Each turn's
    * text embeds two entity surfaces around one property surface plus filler
    * distractors — the planted (subjIdx, predIdx, objIdx) triple is a pure
    * function of (conv, turn), so golden triples are derivable in tests.
    */
  def transcripts(
      spark: SparkSession, convs: Long, turnsPerConv: Int,
      nEnts: Long, mProps: Long, richLabels: Boolean = false): DataFrame = {
    val lbl = labelFn(richLabels)
    val base = spark.range(convs * turnsPerConv)
      .withColumn("conv", expr(s"id div $turnsPerConv"))
      .withColumn("turn_idx", pmod(col("id"), lit(turnsPerConv.toLong)).cast("int"))
    val a = pmod(col("conv") * 31 + col("turn_idx") * 7, lit(nEnts))
    val b = pmod(col("conv") * 17 + col("turn_idx") * 13 + 1, lit(nEnts))
    val p = pmod(col("conv") * 13 + col("turn_idx") * 3, lit(mProps))
    base
      .withColumn("conv_id", format_string("conv-%06d", col("conv")))
      .withColumn("role",
        element_at(typedlit(Seq("user", "assistant", "tool")),
          (pmod(col("turn_idx"), lit(3)) + 1).cast("int")))
      .withColumn("text", concat_ws(" ",
        pick(fillers, col("conv") + col("turn_idx")),
        lbl(a),
        propLabel(p),
        lbl(b),
        pick(fillers, col("conv") * 3 + col("turn_idx") * 5 + 1)))
      .withColumn("tool",
        when(col("role") === "tool",
          element_at(typedlit(Seq("search", "code")),
            (pmod(col("conv"), lit(2)) + 1).cast("int")))
          .otherwise(lit("")))
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("conv") * 3600 + col("turn_idx")))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
}
