package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Union-find canonicalization as distributed connected components over a
  * `Dataset` of edges, via alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
  * public algorithm; converges in O(log n) rounds vs O(diameter) for naive
  * min-label propagation).
  *
  * Node ids are strings (qids); the canonical representative of a component
  * is its lexicographic minimum. Each round is two shuffles (groupBy node);
  * `localCheckpoint` cuts lineage per iteration so plans stay bounded —
  * Catalyst cannot express fixpoints, this loop is the documented exception
  * (SURVEY.md §4.2).
  */
object Canonicalize {

  /** large-star: connect every neighbor strictly larger than u to
    * min(u ∪ N(u)).
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = und.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u").as("lu"), least(col("lu"), col("mn")).as("m"))
    und.join(mins, col("u") === col("lu"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** small-star: for u > v edges, connect every smaller neighbor (and u) to
    * min(u ∪ smaller-N(u)).
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(mins, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Run to fixpoint; returns the canonical mapping (node, canonical_id)
    * covering every node that appears in `edges` (singletons absent — callers
    * coalesce missing nodes to themselves).
    */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 25): DataFrame = {
    var edges = edges0.select(col("u"), col("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // fixpoint: the edge set is stable. One job: count + order-insensitive
      // checksum of old and new edge sets side by side.
      val check = edges.select(lit(0).as("side"), col("u"), col("v"))
        .union(next.select(lit(1).as("side"), col("u"), col("v")))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(xxhash64(u, v))").as("h"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.get(2))).toMap
      converged = check.get(0) == check.get(1)
      edges = next
      iter += 1
    }
    // after convergence the graph is a star forest: v is the root
    val stars = edges.select(col("u").as("node"), col("v").as("canonical_id"))
    val roots = edges.select(col("v").as("node")).distinct()
      .withColumn("canonical_id", col("node"))
    stars.union(roots)
      .groupBy("node").agg(min(col("canonical_id")).as("canonical_id"))
  }

  /** Rewrite triples through the canonical map (left joins; ids without a
    * component map to themselves).
    */
  def canonicalizeTriples(triples: DataFrame, canon: DataFrame): DataFrame = {
    val cs = canon.select(col("node").as("s_node"), col("canonical_id").as("s_canon"))
    val co = canon.select(col("node").as("o_node"), col("canonical_id").as("o_canon"))
    triples
      .join(cs, triples("subj") === col("s_node"), "left")
      .join(co, triples("obj") === col("o_node"), "left")
      .withColumn("subj", coalesce(col("s_canon"), col("subj")))
      .withColumn("obj", coalesce(col("o_canon"), col("obj")))
      .drop("s_node", "s_canon", "o_node", "o_canon")
  }
}
