package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full transcript→KG flow (dictionaries → broadcast mention
    * detection → salted link scoring → triple extraction → CC
    * canonicalization) on a small deterministic synthesized corpus.
    * Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val res = graft.pipeline.KgPipeline.run(
      spark,
      graft.synth.Synth.transcripts(spark, convs = 50, turnsPerConv = 8,
        nEnts = 300, mProps = 25),
      graft.synth.Synth.entityDump(spark, 300),
      graft.synth.Synth.propertyDump(spark, 25),
      graft.synth.Synth.redirects(spark, 300),
      out)
    res.edges
  }
  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data ops. Hash-based LSH / float-ranked ANN entries are
    * rows-only (no oracle) and verified in-engine against brute force.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    import graft.queries.{CoreQueries => C, KgQueries => K, OpsQueries => O}
    Map(
      "a1_group_label" -> (C.a1GroupLabel _),
      "a2_explode_tokens" -> (C.a2ExplodeTokens _),
      "a4_rare_surfaces" -> (C.a4RareSurfaces _),
      "a5_max_count_dedup" -> (C.a5MaxCountDedup _),
      "a8_invert_index" -> (C.a8InvertIndex _),
      "j1_left_join_enrich" -> (C.j1LeftJoinEnrich _),
      "j2_two_hop" -> (C.j2TwoHop _),
      "j3_popularity_demote" -> (C.j3PopularityDemote _),
      "e1_unique_labels" -> (C.e1UniqueLabels _),
      "e5_anti_join_vacancy" -> (C.e5AntiJoinVacancy _),
      "semi_join_active" -> (C.semiJoinActive _),
      "o2_window_top1" -> (C.o2WindowTop1 _),
      "salted_agg_equiv" -> (C.saltedAggEquiv _),
      "sessionize_events" -> (C.sessionizeEvents _),
      "turns_stable_order" -> (C.turnsStableOrder _),
      "p11_qualifier_explode" -> (C.p11QualifierExplode _),
      "p2_regex_parse" -> (C.p2RegexParse _),
      "cc_components" -> (C.ccComponents _),
      "s1_dump_agg" -> (K.s1DumpAgg _),
      "kg_entity_index" -> (K.kgEntityIndex _),
      "kg_property_index" -> (K.kgPropertyIndex _),
      "kg_mentions" -> (K.kgMentions _),
      "kg_triples" -> (K.kgTriples _),
      "dedup_exact" -> (O.dedupExact _),
      "dedup_jaccard_pairs" -> (O.dedupJaccardPairs _),
      "dedup_minhash_lsh" -> (O.dedupMinhashLsh _),
      "dedup_minhash_capped" -> (O.dedupMinhashCapped _),
      "dedup_clusters" -> (O.dedupClusters _),
      "curate_corpus" -> (O.curateCorpus _),
      "dedup_simhash" -> (O.dedupSimhash _),
      "text_quality" -> (O.textQuality _),
      "lang_id" -> (O.langId _),
      "token_counts" -> (O.tokenCounts _),
      "doc_fingerprint" -> (O.docFingerprint _),
      "rep_signals" -> (O.repSignals _),
      "chunk_windows" -> (O.chunkWindows _),
      "pii_scrub" -> (O.piiScrub _),
      "domain_mix" -> (O.domainMix _),
      "decontam_overlap" -> (O.decontamOverlap _),
      "pack_sequences" -> (O.packSequences _),
      "shuffle_positions" -> (O.shufflePositions _),
      "length_quantiles" -> (O.lengthQuantiles _),
      "word_freqs" -> (O.wordFreqs _),
      "bpe_pairs" -> (O.bpePairs _),
      "embed_kmeans" -> (O.embedKmeans _),
      "semantic_dedup" -> (O.semanticDedup _),
      "semantic_dedup_capped" -> (O.semanticDedupCapped _),
      "multimodal_meta" -> (O.multimodalMeta _),
      "multimodal_features" -> (O.multimodalFeatures _),
      "multimodal_bmp" -> (O.multimodalBmp _),
      "multimodal_wav" -> (O.multimodalWav _),
      "frame_sample" -> (O.frameSample _),
      "embed_stats" -> (O.embedStats _),
      "ann_brute_topk" -> (O.annBruteTopK _),
      "ann_ivf_topk" -> (O.annIvfTopK _),
      "embed_near_dups" -> (O.embedNearDups _))
  }
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Oracles.all
}
