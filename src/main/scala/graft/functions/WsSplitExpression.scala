package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenizer as a native codegen expression — a byte-scan
  * drop-in for `split(col, "\\s+")`, which burns the text-pipeline floor
  * in java.util.regex (measured 1.60 s vs 0.27 s for the same scan at
  * sf0.1 — the regex is ~6× the whole corpus read).
  *
  * EXACT `split(s, "\\s+", -1)` semantics, bit-for-bit: segments between
  * runs of `[ \t\n\f\r]` (Java regex `\s`, ASCII-only — the same
  * class RE2's `\s` matches, so DuckDB `string_split_regex(s, '\s+')`
  * oracles stay valid); a leading run yields a leading "" element and a
  * trailing run a trailing "" (Java split keeps both at limit -1).
  * The scan is over UTF-8 BYTES — every `\s` char is ASCII and UTF-8
  * multi-byte units all have the high bit set, so no decoding is needed
  * and tokens are zero-copy slices of the input buffer. */
case class WsSplitExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_split"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ws_split requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    WsSplitExpr.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = WsSplitExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $helper.split(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): WsSplitExpr =
    copy(child = newChild)
}

object WsSplitExpr {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Static entry for both interpreted and generated code paths. */
  def split(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // one materialization; slices below are views
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](32)
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    // final segment: empty iff the string ended in whitespace (Java
    // split at limit -1 keeps that trailing "")
    out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  /** Column wrapper: `wsSplit(c)` ≡ `split(c, "\\s+")`. */
  def wsSplit(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(WsSplitExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Register as SQL function `ws_split`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ws_split"),
      new ExpressionInfo(classOf[WsSplitExpr].getName, "ws_split"),
      (exprs: Seq[Expression]) => WsSplitExpr(exprs.head))
}
