package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batched mention detection (SURVEY.md §2.9): token n-grams of every turn
  * joined against the natural-language index, then overlap resolution by a
  * non-recursive longest-match dominance rule.
  *
  * Three physical shapes, ONE semantics (equivalence-tested):
  *
  *  - [[detect]] — pure Catalyst: codegen'd n-gram generate + dictionary join
  *    + dominance self-anti-join. Expressible in plain SQL (the DuckDB oracle
  *    path). The dictionary side broadcasts by default.
  *  - [[detect]] with `broadcastDict = false` — the same plan shapes but a
  *    SHUFFLE join on the surface key: the path for dictionaries too large to
  *    broadcast (the grams side partitions by surface; no driver collect at
  *    all).
  *  - [[detectFast]] — a broadcast token-TRIE scanned in one narrow
  *    `mapPartitions` (Aho-Corasick-style, SURVEY §2.7): no gram explode, no
  *    shuffle, zero string concatenation in the hot loop. The pipeline's
  *    default for broadcast-sized dictionaries.
  *
  * [[detectAuto]] picks between the trie scan and the shuffle join by the
  * dictionary's size — an unconditional broadcast/driver-collect of a 10^8-row
  * dictionary would be a multi-GB driver build (VERDICT r01 #4).
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
      .select(col("msurface").as("surface"), col("surface").as("base"),
        col("id"), col("kind"), lit(isProp).as("is_prop"), col("weight"))
  }

  /** Dictionaries built outside [[renderSurfaces]] may lack the undecorated
    * `base` column — default it to the surface itself.
    */
  private def withBase(dictionary: DataFrame): DataFrame =
    if (dictionary.columns.contains("base")) dictionary
    else dictionary.withColumn("base", col("surface"))

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

  /** Detect + link mentions — the Catalyst formulation.
    * @param turns (conv_id, turn_idx, text, ...)
    * @param dictionary union of rendered entity + property surfaces
    *                   (surface, id, kind, is_prop, weight)
    * @param broadcastDict false → shuffle join on the surface key (the
    *                      beyond-broadcast-scale dictionary path)
    * @return (conv_id, turn_idx, span_start, span_end, surface, id, kind,
    *          is_prop, score)
    */
  def detect(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4,
      broadcastDict: Boolean = true): DataFrame =
    detectTracked(turns, dictionary, maxN, broadcastDict)._1

  /** [[detect]] plus the persisted intermediate it pins (the match set rides
    * BOTH sides of the dominance anti-join). Callers that materialize the
    * result should unpersist the returned handles afterwards — `detect`
    * alone would leak its cache across repeated calls in one session
    * (VERDICT r02 #2; mirrors `EntityIndexBuilder.buildTracked`).
    */
  def detectTracked(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4,
      broadcastDict: Boolean = true): (DataFrame, Seq[DataFrame]) = {
    val grams = turns
      .select(col("conv_id"), col("turn_idx"),
        explode(ngrams(col("text"), maxN)).as("g"))
      .select(col("conv_id"), col("turn_idx"),
        col("g.start").as("span_start"),
        (col("g.start") + col("g.len")).as("span_end"),
        col("g.gram").as("surface"))
    val dict = withBase(dictionary)
    val dictSide = if (broadcastDict) broadcast(dict) else dict
    // persisted: the dominance anti-join reads `matches` on BOTH sides — the
    // gram generate + dictionary probe (the expensive part) must run once.
    val matches = grams
      .join(dictSide, Seq("surface"))
      .select(col("conv_id"), col("turn_idx"), col("span_start"), col("span_end"),
        col("surface"), col("id"), col("kind"), col("is_prop"),
        col("weight").cast("double").as("score"), col("base"))
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
    val out = m.join(d,
      col("m.conv_id") === col("d.conv_id") &&
        col("m.turn_idx") === col("d.turn_idx") && overlap && better,
      "left_anti")
    (out, Seq(matches))
  }

  /** The dictionary as compact parallel arrays — what actually rides the
    * broadcast. Java-serializes as five flat arrays (fast) instead of a
    * million-object trie graph (slow, and built on the DRIVER — a pure
    * Amdahl serial fraction the full-pipeline scaling pair exposed).
    */
  final case class DictRows(
      surfaces: Array[String], ids: Array[String], kinds: Array[Int],
      isProp: Array[Boolean], weights: Array[Double], bases: Array[String])

  /** Token trie over multi-token surfaces: flat arrays of nodes, children
    * keyed by TOKEN (not character), payload on terminal nodes. The scan
    * walks tokens with zero string concatenation or gram allocation —
    * matched surfaces come out of the payload arrays. Built lazily ONCE PER
    * EXECUTOR JVM from the broadcast [[DictRows]] (see [[SurfaceTrie.of]]),
    * never serialized.
    */
  final class SurfaceTrie(
      val kids: Array[java.util.HashMap[String, Integer]],
      val hit: Array[Int], // node → payload index, -1 if non-terminal
      val rows: DictRows) {
    def size: Int = rows.surfaces.length
  }

  object SurfaceTrie {
    def build(rows: DictRows): SurfaceTrie = {
      val kids = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[String, Integer]())
      val hit = scala.collection.mutable.ArrayBuffer(-1)
      var p = 0
      while (p < rows.surfaces.length) {
        val surface = rows.surfaces(p)
        var node = 0
        def step(tok: String): Unit = {
          val nxt = kids(node).get(tok)
          node = if (nxt != null) nxt.intValue()
          else {
            kids += new java.util.HashMap[String, Integer]()
            hit += -1
            kids(node).put(tok, kids.length - 1)
            kids.length - 1
          }
        }
        // fast path: most dictionary surfaces are single-token — skip the
        // split allocation entirely (this build is on the job's serial path)
        if (surface.indexOf(' ') < 0) step(surface)
        else surface.split(" ").foreach(step)
        hit(node) = p
        p += 1
      }
      new SurfaceTrie(kids.toArray, hit.toArray, rows)
    }

    // per-JVM trie cache keyed by broadcast id: the trie is built once per
    // executor (in parallel across executors, off the driver's critical
    // path) and shared by every task/partition in that JVM
    private val cache = new java.util.concurrent.ConcurrentHashMap[Long, SurfaceTrie]()

    def of(broadcastId: Long, rows: => DictRows): SurfaceTrie = {
      if (cache.size > 8) cache.clear() // bound growth across dictionaries
      cache.computeIfAbsent(broadcastId, _ => build(rows))
    }
  }

  /** Trie-scan variant of [[detect]] — IDENTICAL semantics (same match set,
    * same dominance rule; equivalence-tested), different physical shape: a
    * single narrow `mapPartitions` over turns probing a broadcast token-trie.
    * No gram explode, no self-join shuffle — overlap resolution happens per
    * turn in memory, and the token walk allocates nothing per step (no gram
    * concatenation; trie descent replaces the round-1 prefix-set probe).
    *
    * The dictionary is collected to the driver and broadcast — use
    * [[detectAuto]] when the dictionary may exceed broadcast scale.
    */
  /** Compact the dictionary to flat arrays and broadcast it — the shared
    * front end of [[detectFast]] and [[detectFastTs]].
    *
    * EXECUTOR-PARALLEL compaction: each partition decodes its rows into one
    * flat DictRows (the expensive per-row work runs on executors, in
    * parallel); the driver only arraycopies the partials together. The
    * round-2 shape collected raw Rows and decoded them in a single driver
    * thread — a pure Amdahl serial fraction the full-span scaling pair
    * exposed (VERDICT r02 next-step #2).
    */
  private[graft] def compactDict(
      dictionary: DataFrame): org.apache.spark.broadcast.Broadcast[DictRows] = {
    val spark = dictionary.sparkSession
    val parts: Array[DictRows] = withBase(dictionary)
      .select(col("surface"), col("id"), col("kind"), col("is_prop"),
        col("weight").cast("double"), col("base"))
      .rdd.mapPartitions { it =>
        val s = Array.newBuilder[String]; val ids = Array.newBuilder[String]
        val k = Array.newBuilder[Int]; val p = Array.newBuilder[Boolean]
        val w = Array.newBuilder[Double]; val b = Array.newBuilder[String]
        while (it.hasNext) {
          val r = it.next()
          s += r.getString(0); ids += r.getString(1); k += r.getInt(2)
          p += r.getBoolean(3); w += r.getDouble(4); b += r.getString(5)
        }
        Iterator.single(DictRows(s.result(), ids.result(), k.result(),
          p.result(), w.result(), b.result()))
      }.collect()
    val n = parts.iterator.map(_.surfaces.length).sum
    val rows = DictRows(new Array[String](n), new Array[String](n),
      new Array[Int](n), new Array[Boolean](n), new Array[Double](n),
      new Array[String](n))
    var off = 0
    parts.foreach { pr =>
      val m = pr.surfaces.length
      System.arraycopy(pr.surfaces, 0, rows.surfaces, off, m)
      System.arraycopy(pr.ids, 0, rows.ids, off, m)
      System.arraycopy(pr.kinds, 0, rows.kinds, off, m)
      System.arraycopy(pr.isProp, 0, rows.isProp, off, m)
      System.arraycopy(pr.weights, 0, rows.weights, off, m)
      System.arraycopy(pr.bases, 0, rows.bases, off, m)
      off += m
    }
    spark.sparkContext.broadcast(rows)
  }

  /** Whitespace tokenizer of the scan hot loop, compiled ONCE per JVM:
    * `String.split("\\s+")` recompiles the regex on every call (the JDK
    * fast path covers only single literal characters) — at 10^7 turns per
    * partition that is 10^7 `Pattern.compile`s inside the dominant stage.
    * Semantics identical to `split(text, "\\s+")` everywhere else.
    */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** One turn's trie scan + dominance filter: (span_start, span_end,
    * payload index) of the surviving matches.
    */
  private[graft] def scanText(t: SurfaceTrie, text: String,
      maxN: Int): Iterator[(Int, Int, Int)] = {
    val toks = Whitespace.split(text)
    // (start, end, payload)
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < toks.length) {
      var node = 0
      var j = i
      var continue = true
      while (continue && j < toks.length && j - i < maxN) {
        val nxt = t.kids(node).get(toks(j))
        if (nxt == null) continue = false
        else {
          node = nxt.intValue()
          j += 1
          if (t.hit(node) >= 0) found += ((i, j, t.hit(node)))
        }
      }
      i += 1
    }
    // dominance: survives iff no overlapping strictly-better match
    found.iterator.filter { case (s, e, _) =>
      !found.exists { case (s2, e2, _) =>
        s2 < e && s < e2 &&
          ((e2 - s2) > (e - s) || ((e2 - s2) == (e - s) && s2 < s))
      }
    }
  }

  def detectFast(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bcRows = compactDict(dictionary)
    turns.select(col("conv_id"), col("turn_idx").cast("int"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        // trie built once per executor JVM from the flat broadcast arrays
        val t = SurfaceTrie.of(bcRows.id, bcRows.value)
        val d = t.rows
        it.flatMap { case (conv, turn, text) =>
          scanText(t, text, maxN).map { case (s, e, p) =>
            (conv, turn, s, e, d.surfaces(p), d.ids(p), d.kinds(p), d.isProp(p),
              d.weights(p), d.bases(p))
          }
        }
      }
      .toDF("conv_id", "turn_idx", "span_start", "span_end", "surface", "id",
        "kind", "is_prop", "score", "base")
  }

  /** [[detectFast]] with the turn's event time (`ts`) carried through — the
    * streaming path re-applies `withWatermark` on the OUTPUT's ts column
    * (this typed scan strips attribute metadata, so an upstream watermark
    * would not reach a downstream stateful operator) and gates its state
    * flushes on it ([[graft.streaming.IncrementalKg.statefulTriplesStream]]).
    */
  def detectFastTs(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bcRows = compactDict(dictionary)
    turns.select(col("conv_id"), col("turn_idx").cast("int"), col("text"),
        col("ts"))
      .as[(String, Int, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val t = SurfaceTrie.of(bcRows.id, bcRows.value)
        val d = t.rows
        it.flatMap { case (conv, turn, text, ts) =>
          scanText(t, text, maxN).map { case (s, e, p) =>
            (conv, turn, s, e, d.surfaces(p), d.ids(p), d.kinds(p), d.isProp(p),
              d.weights(p), d.bases(p), ts)
          }
        }
      }
      .toDF("conv_id", "turn_idx", "span_start", "span_end", "surface", "id",
        "kind", "is_prop", "score", "base", "ts")
  }

  /** Size-guarded detection: trie scan while the dictionary fits broadcast
    * (row-count proxy; ~100 bytes/entry ⇒ the 20M default is a ~2 GB
    * broadcast), shuffle join beyond it. Both paths produce identical rows.
    *
    * Prefer [[detectAutoTracked]] with a `knownDictRows` hint: the pipeline
    * already knows the index stage row counts from their manifests, so the
    * path decision costs no extra job (VERDICT r02 #3 / ADVICE r02).
    */
  def detectAuto(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4,
      broadcastMaxRows: Long = 20000000L): DataFrame =
    detectAutoTracked(turns, dictionary, maxN, broadcastMaxRows)._1

  /** [[detectAuto]] plus the persisted handles to release after the result
    * is materialized.
    *
    * @param knownDictRows caller-known dictionary row count (or a safe UPPER
    *                      bound, e.g. the sum of the committed index stage
    *                      manifests' row counts — an overestimate can only
    *                      flip to the always-safe shuffle join). None →
    *                      count once over a persisted dictionary so the
    *                      (often expensive) dictionary plan is not evaluated
    *                      twice by count + collect.
    */
  def detectAutoTracked(turns: DataFrame, dictionary: DataFrame, maxN: Int = 4,
      broadcastMaxRows: Long = 20000000L,
      knownDictRows: Option[Long] = None): (DataFrame, Seq[DataFrame]) =
    knownDictRows match {
      case Some(nr) =>
        if (nr <= broadcastMaxRows) (detectFast(turns, dictionary, maxN), Nil)
        else detectTracked(turns, dictionary, maxN, broadcastDict = false)
      case None =>
        val d = dictionary.persist()
        val nr = d.count()
        if (nr <= broadcastMaxRows) {
          val out = detectFast(turns, d, maxN) // collects d NOW (cache hit)
          d.unpersist(blocking = false)
          (out, Nil)
        } else {
          val (out, caches) = detectTracked(turns, d, maxN, broadcastDict = false)
          (out, caches :+ d)
        }
    }
}
