package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between two numeric
  * array columns, `dot(x,y) / (sqrt(dot(x,x)) * sqrt(dot(y,y)))`.
  *
  * Replaces the 3×`dim`-term unrolled arithmetic chains previously
  * emitted as expression strings (operators.Similarity.dotExpr): the
  * generated code is a ~20-line loop instead of a ~400-node expression
  * tree, so janino compiles it in milliseconds (the unrolled chains
  * measured a ~1 s compile floor per plan) and the dimension is read
  * from the data instead of being baked into the plan.
  *
  * Numeric contract (load-bearing for the oracle gate): all three
  * accumulators run left-to-right over ascending index, exactly the
  * association of the unrolled chain `((0+x₁y₁)+x₂y₂)+…`, so results
  * are bit-identical to both the old chains and any engine that
  * replays the same sequential fold (the DuckDB oracles do). Java
  * doubles are strict IEEE-754 (JEP 306), leaving no platform drift.
  *
  * Null contract: null array → null; a null ELEMENT in either array →
  * null (the unrolled chain's `null * x` propagation); a zero-norm or
  * empty input → null, reproducing the unrolled chain's non-ANSI
  * `Divide`-by-zero → NULL (raw IEEE division would yield NaN, and
  * Spark sorts NaN above every double, so a `cos >= τ` filter would
  * emit spurious NaN "near-dup" pairs and diverge from the DuckDB
  * oracle's NULL handling). Lengths may differ; the common prefix is
  * used.
  *
  * Registered as SQL function `graft_cosine` via
  * `SparkSessionExtensions.injectFunction` (see GraftSession) — the
  * extension-point route, so `expr("graft_cosine(a, b)")` works in any
  * SQL/DataFrame context without a UDF.
  */
object CosineSimilarity {
  /** The interpreted kernel, shared verbatim with [[TopCells]] so the
    * per-centroid cosines there are bit-identical to `graft_cosine` by
    * construction (same left-to-right fold, same null/zero-norm
    * contract). Returns null (boxed) per the expression's null rules. */
  private[functions] def cosine(xa: ArrayData, xf: Boolean,
      ya: ArrayData, yf: Boolean): java.lang.Double = {
    val n = math.min(xa.numElements(), ya.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || ya.isNullAt(i)) return null
      val x = if (xf) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (yf) ya.getFloat(i).toDouble else ya.getDouble(i)
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null // covers n == 0; Divide-by-zero → NULL
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType.isInstanceOf[ArrayType] &&
        (elemType(e) == FloatType || elemType(e) == DoubleType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  // Null even for non-nullable inputs (null elements, zero norms) — and
  // load-bearing for codegen: BinaryExpression's default would take the
  // non-nullable nullSafeCodeGen branch, where the loop's `isNull = true`
  // references an undeclared variable (janino failure → silent
  // interpreted fallback).
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CosineSimilarity.cosine(
      l.asInstanceOf[ArrayData], elemType(left) == FloatType,
      r.asInstanceOf[ArrayData], elemType(right) == FloatType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xacc = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val yacc = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xa.isNullAt($i) || $ya.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = (double) $xa.$xacc($i);
         |  double $y = (double) $ya.$yacc($i);
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |if (!${ev.isNull}) {
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}
