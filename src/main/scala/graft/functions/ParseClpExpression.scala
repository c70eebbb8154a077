package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `parse_clp` as a native Catalyst expression with codegen — the hot-path
  * tier above a Scala UDF (no ScalaUDF closure dispatch, no Row boxing;
  * the generated code calls a static helper directly and stays inside
  * whole-stage codegen).
  *
  * Null semantics: null/unparseable input → null (error details stay on
  * the UDF surface `parse_clp_err` for pipelines that need them).
  */
case class ParseClpExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_clp_native"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"parse_clp_native requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    ParseClpExpr.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("parsed")
    val helper = ParseClpExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${childGen.isNull}) {
        java.lang.Long $boxed = $helper.parse(${childGen.value});
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.longValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseClpExpr =
    copy(child = newChild)
}

object ParseClpExpr {
  /** Static entry for both interpreted and generated code paths. */
  def parse(s: UTF8String): java.lang.Long =
    if (s == null) null
    else PollaParsers.parseClp(s.toString) match {
      case Right(v) => java.lang.Long.valueOf(v)
      case Left(_) => null
    }

  /** Register as a SQL function `parse_clp_native`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parse_clp_native"),
      new ExpressionInfo(classOf[ParseClpExpr].getName, "parse_clp_native"),
      (exprs: Seq[Expression]) => ParseClpExpr(exprs.head))
}
