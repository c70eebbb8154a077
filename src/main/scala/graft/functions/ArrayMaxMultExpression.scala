package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Max element multiplicity of a string array, as one native expression:
  * `array_max_mult(['a','b','a']) = 2`, empty/`[]` → 0 (null array →
  * null). The repetition-signal primitive ([[graft.ops.TextAnalysis
  * .repetitionSignals]]): a document's most-repeated n-gram count is a
  * pure function of that document's own gram array, so computing it
  * map-side here replaces the explode → groupBy(doc, gram) →
  * groupBy(doc) two-shuffle shape the query previously paid (the gram
  * stream through both exchanges was ~100× the per-doc result width;
  * r18 — the sf0.1-gate tier). One hash map per row, no allocation
  * beyond it, inside whole-stage codegen. */
case class ArrayMaxMultExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "array_max_mult"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_max_mult requires ARRAY<STRING>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ArrayMaxMultExpr.maxMult(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = ArrayMaxMultExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        ${ev.value} = $helper.maxMult(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayMaxMultExpr =
    copy(child = newChild)
}

object ArrayMaxMultExpr {

  /** Static entry for both interpreted and generated code paths. Null
    * ELEMENTS count as a value of their own (matching what a groupBy on
    * the exploded array would aggregate). */
  def maxMult(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[AnyRef, Array[Int]](Math.max(16, n * 2))
    var best = 0
    var i = 0
    while (i < n) {
      val k: AnyRef = if (arr.isNullAt(i)) NullKey else arr.getUTF8String(i)
      var c = m.get(k)
      if (c == null) { c = new Array[Int](1); m.put(k, c) }
      c(0) += 1
      if (c(0) > best) best = c(0)
      i += 1
    }
    best
  }

  private object NullKey

  /** Column wrapper. */
  def arrayMaxMult(c: Column): Column =
    GraftColumnBridge.column(ArrayMaxMultExpr(GraftColumnBridge.expression(c)))
}
