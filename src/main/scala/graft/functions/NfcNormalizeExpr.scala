package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression with codegen.
  *
  * Web-scraped corpora mix composed and decomposed forms of the same
  * glyph (`é` = U+00E9 vs `e` + U+0301): without canonical normalization,
  * exact dedup, shingle hashing, and token counting all treat the two
  * spellings as different content. Normalizing is the first step of any
  * text-curation chain, so it must stay inside whole-stage codegen — a
  * per-row Scala UDF here would box every document string on the hottest
  * map-side path of a 100 TB scan.
  *
  * Spark has no built-in NFC function (DuckDB ships `nfc_normalize`); the
  * JDK's `java.text.Normalizer` is the standard implementation and needs
  * no extra dependency. The fast path (`Normalizer.isNormalized`) skips
  * allocation entirely for already-NFC text — the overwhelmingly common
  * case — making this near-free on clean corpora.
  *
  * Null semantics: null in → null out.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NfcNormalizeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static entry for both interpreted and generated code paths. */
  def normalize(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }

  /** Column builder for DataFrame use. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(c)))

  /** Register as a SQL function `nfc_normalize` (same name as DuckDB's). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalizeExpr(exprs.head))
}
