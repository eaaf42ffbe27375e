package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batched mention detection (SURVEY.md §2.9): token n-grams of every turn
  * joined against the broadcast natural-language index, then overlap
  * resolution by a non-recursive longest-match dominance rule.
  *
  * Spark-first: the n-gram generate is a single codegen'd higher-order
  * expression (no UDF, no driver loop); the dictionary side is explicitly
  * `broadcast()` (it is the small side by construction — the reference holds
  * it in RAM); the overlap resolution is a per-turn self-anti-join, so the
  * whole stage is shuffle-free except the one hash partition on
  * (conv_id, turn_idx) that AQE can coalesce.
  *
  * Dominance rule (deterministic, set-algebraic — unlike sequential maximal
  * munch it needs no recursion, so the same rule is expressible in the DuckDB
  * oracle): a match survives iff no OTHER overlapping match is longer, or
  * equally long with an earlier start. Spans are in token space.
  */
object Mentions {

  /** Render index entries to matchable surfaces: `label` or `label (info)`
    * (`kg-entities.rs:204,366-370`); rendered collisions resolved by the Ent
    * priority lattice then id (deterministic superset of the reference, whose
    * keys are (surface, info) pairs and never rendered-collide).
    * Input: (surface, info?, id, kind [, weight]); output: distinct
    * (surface, id, kind, is_prop, weight).
    */
  def renderSurfaces(index: DataFrame, isProp: Boolean): DataFrame = {
    val withW =
      if (index.columns.contains("weight")) index
      else index.withColumn("weight", lit(1L))
    val rendered = withW.withColumn(
      "msurface",
      when(col("info").isNotNull && col("info") =!= "",
        concat(col("surface"), lit(" ("), col("info"), lit(")")))
        .otherwise(col("surface")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("msurface"))
      .orderBy(col("kind").asc, col("id").asc)
    rendered
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("msurface").as("surface"), col("id"), col("kind"),
        lit(isProp).as("is_prop"), col("weight"))
  }

  /** All token n-grams (n = 1..maxN) of `textCol` with token-space start
    * positions, as one flattened array<struct<start,len,gram>>.
    */
  def ngrams(textCol: Column, maxN: Int): Column = {
    // toks = split on whitespace; grams via nested higher-order transforms —
    // stays inside WholeStageCodegen.
    // split never yields an empty array (split("","\\s+") = [""]), so the
    // inner sequence bound is safe; out-of-range (i, n) pairs are nulled and
    // filtered rather than risking a descending `sequence`.
    val toks = split(textCol, "\\s+")
    flatten(
      transform(
        sequence(lit(1), lit(maxN)),
        n => filter(
          transform(
            sequence(lit(0), size(toks) - 1),
            i => when(i + n <= size(toks),
              struct(
                i.as("start"),
                n.as("len"),
                concat_ws(" ", slice(toks, i + 1, n)).as("gram")))),
          x => x.isNotNull)))
  }

  /** Detect + link mentions.
    * @param turns (conv_id, turn_idx, text, ...)
    * @param dictionary union of rendered entity + property surfaces
    *                   (surface, id, kind, is_prop, weight)
    * @return (conv_id, turn_idx, span_start, span_end, surface, id, kind,
    *          is_prop, score)
    */
  def detect(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4): DataFrame = {
    val grams = turns
      .select(col("conv_id"), col("turn_idx"),
        explode(ngrams(col("text"), maxN)).as("g"))
      .select(col("conv_id"), col("turn_idx"),
        col("g.start").as("span_start"),
        (col("g.start") + col("g.len")).as("span_end"),
        col("g.gram").as("surface"))
    // persisted: the dominance anti-join reads `matches` on BOTH sides — the
    // gram generate + broadcast probe (the expensive part) must run once.
    val matches = grams
      .join(broadcast(dictionary), Seq("surface"))
      .select(col("conv_id"), col("turn_idx"), col("span_start"), col("span_end"),
        col("surface"), col("id"), col("kind"), col("is_prop"),
        col("weight").cast("double").as("score"))
      .persist()

    // dominance anti-join: drop matches overlapped by a strictly better one
    val m = matches.alias("m")
    val d = matches.alias("d")
    val overlap = col("d.span_start") < col("m.span_end") &&
      col("m.span_start") < col("d.span_end")
    val better =
      (col("d.span_end") - col("d.span_start")) > (col("m.span_end") - col("m.span_start")) ||
        ((col("d.span_end") - col("d.span_start")) === (col("m.span_end") - col("m.span_start")) &&
          col("d.span_start") < col("m.span_start"))
    m.join(d,
      col("m.conv_id") === col("d.conv_id") &&
        col("m.turn_idx") === col("d.turn_idx") && overlap && better,
      "left_anti")
  }

  /** Trie-scan variant of [[detect]] — IDENTICAL semantics (same match set,
    * same dominance rule; equivalence-tested), different physical shape: a
    * single narrow `mapPartitions` over turns probing a broadcast token-trie
    * (the Aho-Corasick-style path SURVEY.md §2.7 names as the fast
    * alternative). No 60M-row gram explode, no self-join shuffle — overlap
    * resolution happens per turn in memory. This is the pipeline's default;
    * the Catalyst path remains for pure-SQL oracle checking.
    *
    * The dictionary is collected to the driver and broadcast — it IS the
    * broadcast side by design (the reference holds it fully in RAM; at true
    * scale the collected map is the same tens-of-millions-of-entries object).
    */
  def detectFast(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val entries = dictionary
      .select(col("surface"), col("id"), col("kind"), col("is_prop"),
        col("weight").cast("double"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3),
        r.getDouble(4))))
      .toMap
    // prefixes of multi-token surfaces: extension happens only while the
    // current gram can still grow into a dictionary entry
    val prefixes: Set[String] = entries.keysIterator.flatMap { s =>
      val toks = s.split(" ")
      (1 until toks.length).map(j => toks.take(j).mkString(" "))
    }.toSet
    val bcDict = spark.sparkContext.broadcast(entries)
    val bcPrefix = spark.sparkContext.broadcast(prefixes)

    turns.select(col("conv_id"), col("turn_idx").cast("int"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        val dict = bcDict.value
        val pfx = bcPrefix.value
        it.flatMap { case (conv, turn, text) =>
          val toks = text.split("\\s+")
          val found = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Int, String, (String, Int, Boolean, Double))]
          var i = 0
          while (i < toks.length) {
            var gram = toks(i)
            var n = 1
            var continue = true
            while (continue) {
              dict.get(gram).foreach(e => found += ((i, i + n, gram, e)))
              continue = n < maxN && i + n < toks.length && pfx.contains(gram)
              if (continue) { gram = gram + " " + toks(i + n); n += 1 }
            }
            i += 1
          }
          // dominance: survives iff no overlapping strictly-better match
          found.iterator.filter { case (s, e, _, _) =>
            !found.exists { case (s2, e2, _, _) =>
              s2 < e && s < e2 &&
                ((e2 - s2) > (e - s) || ((e2 - s2) == (e - s) && s2 < s))
            }
          }.map { case (s, e, g, (id, kind, isProp, w)) =>
            (conv, turn, s, e, g, id, kind, isProp, w)
          }
        }
      }
      .toDF("conv_id", "turn_idx", "span_start", "span_end", "surface", "id",
        "kind", "is_prop", "score")
  }
}
