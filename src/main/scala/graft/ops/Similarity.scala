package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline (broadcast
  * nested-loop with the query side broadcast); the scale path is IVF —
  * k-means-style coarse quantization where each vector is searched only
  * within its `nProbe` nearest centroid buckets — and sign-LSH bucketing.
  * All dot products are one codegen'd `aggregate(zip_with(...))` expression;
  * math in double for cross-engine determinism.
  */
object Similarity {

  /** dot(a, b): the custom codegen'd Catalyst expression (single fused loop,
    * no intermediate array — see graft.functions.FloatVecDot). The pure
    * built-in formulation is kept for equivalence testing.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vec_dot(a, b)

  /** Built-in-only reference formulation of [[dot]]. */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact brute-force cosine top-k for every vector (excluding itself).
    * @return (vec_id, neighbor_id, rank) — scores deliberately not emitted
    *         (float-sum ordering is engine-specific; ranks are stable for
    *         non-adversarial data).
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    val pairs = v.as("q").join(broadcast(v.as("c")), col("q.id") =!= col("c.id"))
      .select(col("q.id").as("vec_id"), col("c.id").as("neighbor_id"),
        (dot(col("q.vec"), col("c.vec")) / (col("q.nrm") * col("c.nrm"))).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbor_id", "rank")
  }

  /** IVF (inverted-file) ANN: deterministic coarse centroids (every m-th
    * vector), assign each vector to its `nProbe` nearest centroids, search
    * only within shared buckets. Returns the same shape as bruteForceTopK;
    * recall measured in tests.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    // deterministic pseudo-random centroid pick: first nCentroids in hash
    // order (cheap stand-in for k-means; swap in trained centroids at scale)
    val centroids = v.orderBy(xxhash64(col("id")), col("id"))
      .limit(nCentroids)
      .select(col("id").as("cid"), col("vec").as("cvec"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("csim").desc, col("cid").asc)
    val assigned = v.join(broadcast(centroids), expr("true"))
      .withColumn("csim", dot(col("vec"), col("cvec")) / (col("nrm") * col("cnrm")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= nProbe)
      .select(col("id"), col("vec"), col("nrm"), col("cid"))
    val pairs = assigned.as("q").join(assigned.as("c"),
        col("q.cid") === col("c.cid") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("vec_id"), col("c.id").as("neighbor_id"),
        (dot(col("q.vec"), col("c.vec")) / (col("q.nrm") * col("c.nrm"))).as("cos"))
      .groupBy("vec_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbor_id", "rank")
  }

  /** Sign-LSH bucketing: project on `nPlanes` deterministic pseudo-random
    * hyperplanes, bucket by the sign pattern — candidate generation for
    * embedding-cosine near-dup detection at scale.
    */
  def signLshBuckets(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 12): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // plane p, dim d weight: deterministic hash-based in {-1, +1}
    val bucket = aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => acc * 2 + when(
        aggregate(
          zip_with(col("vec"), sequence(lit(0), size(col("vec")) - 1),
            (x, d) => x.cast("double") *
              (pmod(xxhash64(concat(p.cast("string"), lit("_"), d.cast("string"))), lit(2L))
                .cast("double") * 2.0 - 1.0)),
          lit(0.0), (a, x) => a + x) > 0, 1L).otherwise(0L))
    v.withColumn("bucket", bucket)
  }

  /** Embedding-cosine near-duplicate pairs via sign-LSH candidates + exact
    * verification: pairs in the same bucket with cosine >= threshold.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 10): DataFrame = {
    val b = signLshBuckets(df, idCol, vecCol, nPlanes)
      .withColumn("nrm", norm(col("vec")))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cos",
        dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("a"), col("y.id").as("b"), col("cos"))
  }
}
