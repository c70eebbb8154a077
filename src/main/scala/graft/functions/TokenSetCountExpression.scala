package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of whitespace tokens that belong to a fixed token
  * set, as ONE native byte walk — the
  * `size(filter(ws_split(trim(s)), t -> t.isin(set)))` image
  * ([[graft.ops.TextAnalysis.stopwordCount]]'s shape) without the
  * interpreted ArrayFilter, the per-token isin chain, or the token-array
  * allocation. The child must already be lowered when the set is
  * lowercase (callers pass `lower(text)`). Returns INT (what `size`
  * returns). Empty/boundary tokens cannot match a non-empty set member,
  * so the walk skips them — identical counts. TokenSetCountSpec pins
  * equivalence. */
case class TokenSetCountExpr(child: Expression,
    tokens: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_set_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires STRING, got ${child.dataType.catalogString}")

  @transient private lazy val table = TokenSetCountExpr.Table(tokens)

  protected override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val tableRef = ctx.addReferenceObj("tokenSetTable", table,
      classOf[TokenSetCountExpr.Table].getName)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        ${ev.value} = $tableRef.count(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCountExpr =
    copy(child = newChild)
}

object TokenSetCountExpr {

  final case class Table(tokens: Seq[String]) {
    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String]()
      tokens.foreach(t => s.add(UTF8String.fromString(t)))
      s
    }
    private val maxLen: Int = tokens.map(_.getBytes("UTF-8").length).max

    private def isWs(b: Byte): Boolean =
      b == 0x20 || (b >= 0x09 && b <= 0x0D)

    def count(s: UTF8String): Int = {
      val bytes = s.getBytes
      val n = bytes.length
      var c = 0
      var i = 0
      while (i < n) {
        if (isWs(bytes(i))) i += 1
        else {
          val start = i
          while (i < n && !isWs(bytes(i))) i += 1
          if (i - start <= maxLen &&
            set.contains(UTF8String.fromBytes(bytes, start, i - start))) c += 1
        }
      }
      c
    }
  }

  def tokenSetCount(c: Column, tokens: Seq[String]): Column =
    GraftColumnBridge.column(TokenSetCountExpr(
      GraftColumnBridge.expression(c), tokens))
}
