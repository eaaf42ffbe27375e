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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(exprs(0), exprs(1))))
  }
}
