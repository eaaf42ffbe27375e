package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable polynomial string hash
  * that keys the whole dedup/LSH family (TextAnalysis.fingerprint):
  *
  *   acc_0 = 0;  acc_{i+1} = (31·acc_i + codepoint_i) mod 1e9+7
  *
  * Exactly the semantics of the built-in formulation
  * `aggregate(filter(split(s, "")), 0L, (acc, c) -> pmod(acc*31 + ascii(c), 1e9+7))`
  * — Java's `split("")` yields CODEPOINTS (it does not cut surrogate pairs)
  * and `ascii` returns `codePointAt(0)` — but as one fused loop with
  * `doGenCode`: no per-character string array, no two lambda evals per
  * character. On the MinHash/SimHash path this hash runs once per token per
  * document, so the constant factor is the dominant cost of candidate
  * generation at corpus scale. Equivalence is property-tested against the
  * built-in formulation (PolyHashSpec), which also keeps the DuckDB oracles
  * valid (they mirror the built-in form).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $x.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column API. */
  def poly_hash(c: Column): Column = Bridge.column(PolyHash(Bridge.expression(c)))

  /** Register as a SQL function `poly_hash`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs(0)), "scala_udf")
}
