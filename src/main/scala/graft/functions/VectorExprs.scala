package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (codegen'd) vector arithmetic over `array<double>` columns.
  *
  * The higher-order-function forms (`aggregate(zip_with(a, b, …))`) are
  * interpreted per row — each evaluation allocates the zipped array and
  * walks it through lambda closures, and the enclosing project falls out
  * of whole-stage codegen. These expressions generate a tight Java loop
  * instead and stay inside the codegen stage, which matters on the
  * embedding-heavy paths (cosine top-k, IVF assignment) where the dot
  * product runs once per (query, candidate) pair.
  *
  * Semantics match the HOF forms bit-for-bit: strict left-fold
  * accumulation in element order (the same order DuckDB's `list_reduce`
  * uses, so oracle results are unchanged), null if either array is null,
  * contains a null element, or lengths differ (`zip_with` pads the short
  * side with nulls, which poisons the fold the same way).
  */
abstract class VecFoldExpr extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  /** Scala form of the per-element term, for interpreted eval. */
  protected def term(x: Double, y: Double): Double

  /** Java source of the per-element term over the given local names. */
  protected def termCode(x: String, y: String): String

  protected override def nullSafeEval(leftV: Any, rightV: Any): Any = {
    val a = leftV.asInstanceOf[ArrayData]
    val b = rightV.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += term(a.getDouble(i), b.getDouble(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $sum += ${termCode(x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })
}

/** Σᵢ aᵢ·bᵢ — the inner product, left-fold order. */
case class VecDot(left: Expression, right: Expression) extends VecFoldExpr {
  override def prettyName: String = "vec_dot"
  protected def term(x: Double, y: Double): Double = x * y
  protected def termCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Σᵢ (aᵢ−bᵢ)² — squared Euclidean distance, left-fold order. */
case class VecSqDist(left: Expression, right: Expression) extends VecFoldExpr {
  override def prettyName: String = "vec_sqdist"
  protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  protected def termCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}

object VectorExprs {

  /** Column builders — usable without SQL-function registration. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecSqDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** SQL names `vec_dot` / `vec_sqdist` for `spark.sql` users. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sqdist"),
      (children: Seq[Expression]) => VecSqDist(children(0), children(1)))
  }
}
