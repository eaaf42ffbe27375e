package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFunctions
import graft.ops.Similarity

class VecExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def vecs() = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -1.5f), Array(2.0f, 2.0f)),
      (3L, Array.empty[Float], Array.empty[Float]))
      .toDF("id", "a", "b")
  }

  test("vec_dot == built-in aggregate/zip_with formulation") {
    val df = vecs()
      .withColumn("fused", VecFunctions.vec_dot(col("a"), col("b")))
      .withColumn("builtin", Similarity.dotBuiltin(col("a"), col("b")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("fused") - r.getAs[Double]("builtin")) < 1e-9,
        s"id=${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 1L).get.getAs[Double]("fused") == 32.0)
    assert(rows.find(_.getLong(0) == 3L).get.getAs[Double]("fused") == 0.0)
  }

  test("null semantics and SQL registration") {
    import spark.implicits._
    VecFunctions.register(spark)
    val df = Seq((1L, Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("vx")
    val r = spark.sql("SELECT vec_dot(a, b) AS d, vec_dot(a, a) AS s FROM vx").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 1.0)
  }

  test("whole-stage codegen path produces same results as interpreted eval") {
    // force a big enough frame that codegen actually runs, compare against
    // driver-side math
    import spark.implicits._
    val df = spark.range(1000).select(
      col("id"),
      transform(sequence(lit(0), lit(15)), i => (i + col("id")).cast("float")).as("v"))
    val got = df.select(col("id"), VecFunctions.vec_dot(col("v"), col("v")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def expect(id: Long): Double = (0 until 16).map(i => { val x = (i + id).toFloat.toDouble; x * x }).sum
    assert(got(0L) == expect(0L) && got(999L) == expect(999L))
  }
}
