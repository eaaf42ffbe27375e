package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injection point — the deployment-grade way to ship
  * the library's custom Catalyst expressions to every session of a cluster
  * (per-session `register(spark)` calls remain for ad-hoc use):
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * Injects `poly_hash` ([[PolyHash]] — the engine-portable polynomial string
  * hash keying the dedup/LSH family) and `vec_dot` ([[VecFunctions]] — the
  * fused float dot product), both codegen'd.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity check with a proper analysis-time error: without it, SQL like
    * `poly_hash()` or `vec_dot(a)` dies in the builder with a bare
    * IndexOutOfBoundsException instead of the standard wrong-number-of-
    * arguments message (ADVICE r03).
    */
  private def requireArity(name: String, expected: Int,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (exprs.length != expected)
      throw new org.apache.spark.SparkException(
        s"[WRONG_NUM_ARGS] The `$name` function requires $expected " +
          s"parameter(s) but the actual number is ${exprs.length}.")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("poly_hash", 1, exprs)
        PolyHash(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("vec_dot", 2, exprs)
        FloatVecDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("long_vec_dot"),
      new ExpressionInfo(classOf[LongVecDot].getName, "long_vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("long_vec_dot", 2, exprs)
        LongVecDot(exprs(0), exprs(1))
      }))
  }
}
