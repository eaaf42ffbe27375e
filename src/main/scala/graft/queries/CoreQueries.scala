package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.parse.{Kg, ParseKit}
import graft.pipeline.{Canonicalize, SaltedAgg}

/** SQL-expressible core operators (SURVEY.md §2) over the driver-harness
  * TPC-H-ish tables — each has a DuckDB oracle in [[Oracles]].
  * Numeric outputs are integers / exact decimals-as-cents so the oracle
  * compare is bit-stable across engines.
  */
object CoreQueries {

  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** A1: hash aggregation building label groups. */
  def a1GroupLabel(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "part").groupBy(col("p_name").as("surface"))
      .agg(count(lit(1)).as("n_ents"), min(col("p_partkey")).as("min_id"))

  /** A2/A6: explode multi-value column + global frequency count. */
  def a2ExplodeTokens(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** A4: ambiguity filter — surfaces held by few rows survive (a derived
    * `tok<k div 3>` token guarantees groups of ≤3 at every scale).
    */
  def a4RareSurfaces(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "part")
      .select(explode(split(concat_ws(" ", col("p_name"),
        concat(lit("tok"), expr("p_partkey div 3"))), " ")).as("token"),
        col("p_partkey"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("min_id"))
      .filter(col("n") <= 3)

  /** A5/O2: per-group top-1 by measure with deterministic tie-break. */
  def a5MaxCountDedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_type"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    tbl(s, d, "part").withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("p_type", "p_partkey")
  }

  /** A8: output inversion — per key, ordered surface list. */
  def a8InvertIndex(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "supplier").join(tbl(s, d, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(sort_array(collect_list(col("s_name"))), "|").as("suppliers"))

  /** J1: left-join enrichment (redirects pattern); exact cents. */
  def j1LeftJoinEnrich(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "customer").join(tbl(s, d, "nation"),
        col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).multiply(100).cast("long")
          .as("acctbal_cents"))

  /** J2: two-hop self-join-style type resolution. */
  def j2TwoHop(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "supplier")
      .join(tbl(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(tbl(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        countDistinct(col("n_nationkey")).as("n_nations"))

  /** J3: popularity-override demotion via join + conditional. */
  def j3PopularityDemote(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "lineitem").join(tbl(s, d, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(when(col("l_extendedprice") > col("p_retailprice") * 50, 1L)
        .otherwise(0L)).as("n_demoted"),
        count(lit(1)).as("n_total"))

  /** E1: unique plain labels (derived label keeps a mixed unique/colliding
    * population at every scale).
    */
  def e1UniqueLabels(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "part")
      .groupBy(concat(col("p_name"), lit(" v"), pmod(col("p_partkey"), lit(997)))
        .as("surface"))
      .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("id"))
      .filter(col("n") === 1).select("surface", "id")

  /** E5 vacancy: left-anti join (against high-value orders so the vacancy
    * set is non-empty at every scale).
    */
  def e5AntiJoinVacancy(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "customer").join(
        tbl(s, d, "orders").filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Left-semi: rows with at least one match. */
  def semiJoinActive(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "supplier").join(tbl(s, d, "lineitem"),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")

  /** O2: top-1 per group window. */
  def o2WindowTop1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    tbl(s, d, "orders").withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("o_custkey", "o_orderkey")
  }

  /** Salted two-phase aggregation == plain aggregation (oracle is plain). */
  def saltedAggEquiv(s: SparkSession, d: String): DataFrame =
    SaltedAgg(
      tbl(s, d, "events").withColumn("cents",
        col("value").cast("decimal(18,2)") * 100),
      Seq("user_id"),
      Seq(SaltedAgg.Measure("user_id", "count", "n_events"),
        SaltedAgg.Measure("cents", "sum", "c")),
      saltN = 8, saltFrom = Seq("event_id"))
      .select(col("user_id"), col("n_events"), col("c").cast("long").as("value_cents"))

  /** Stable turn ordering + sessionization windows over events. */
  def sessionizeEvents(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // ts arrives as TIMESTAMP_NTZ from the harness parquet; session tz is UTC
    // so the cast is value-preserving and unix_micros == DuckDB epoch_us.
    tbl(s, d, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts").cast("timestamp")) - col("prev_us") > 1800L * 1000000L,
          1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
  }

  /** Per-turn text equality under stable turn ordering (the input_hint
    * invariant) on an events-derived transcript.
    */
  def turnsStableOrder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    tbl(s, d, "events")
      .withColumn("turn_idx", row_number().over(w) - 1)
      .select(concat(lit("u"), col("user_id")).as("conv_id"),
        col("turn_idx"), col("event_type").as("text"))
  }

  /** P11: qualifier-variant generate. */
  def p11QualifierExplode(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "part").select(col("p_brand")).distinct()
      .select(col("p_brand"),
        explode(ParseKit.wikidataQualifierVariants(col("p_brand"))).as("q"))
      .select(col("p_brand"), col("q.surface").as("surface"), col("q.pfx").as("pfx"))

  /** P2/P4: regex id + label extraction on synthesized IRIs. */
  def p2RegexParse(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "supplier")
      .select(
        concat(lit("<http://www.wikidata.org/entity/Q"), col("s_suppkey"), lit(">")).as("iri"),
        concat(lit("\"label "), col("s_suppkey"), lit("\"@en")).as("raw_label"))
      .select(
        ParseKit.extractId(col("iri"), Kg.Wikidata.entPattern, 2).as("qid"),
        ParseKit.extractLabel(col("raw_label")).as("label"))

  /** Connected components over a derived chain graph, vs a recursive-CTE
    * oracle.
    */
  def ccComponents(s: SparkSession, d: String): DataFrame = {
    val edges = tbl(s, d, "customer")
      .filter(pmod(col("c_custkey"), lit(10)) =!= 0)
      .select(format_string("N%06d", col("c_custkey")).as("u"),
        format_string("N%06d", col("c_custkey") - 1).as("v"))
    Canonicalize.connectedComponents(edges)
  }
}
