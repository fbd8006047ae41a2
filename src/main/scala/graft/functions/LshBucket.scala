package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: `bits`-bit random-hyperplane LSH bucket
  * of a numeric array column. Hyperplane signs come from the engine's
  * deterministic LCG (operators.Similarity.lshSign — replayable by any
  * engine): bit j is set when `Σᵢ ±vᵢ ≥ 0` with the sign for (j, i)
  * drawn from `((j·64 + i)·1103515245 + 104729) / 131072 mod 2`
  * (i is 1-based, matching the unrolled chain and the DuckDB oracle).
  *
  * Same contract as [[CosineSimilarity]]: sequential left-to-right
  * accumulation per projection — `x + (−v)` is bit-identical to
  * `x − v` in IEEE-754, so the loop equals the old ±-chain bit for
  * bit (proven in LibraryOpsSpec); a null element or an EMPTY array
  * nulls the result (an empty array would otherwise project 0.0 on
  * every hyperplane and collapse all degenerate vectors into the
  * all-ones bucket — the old NULL-propagating CASE chain sent them to
  * no bucket at all); arrays shorter than 64 hash over their actual
  * length (the old chain was fixed at dim=64 and nulled short arrays);
  * ~30 lines of generated code instead of a bits×dim-term tree.
  *
  * Registered as SQL function `graft_lsh_bucket(v, bits)` via
  * SparkSessionExtensions (GraftSession); `bits` must be a foldable
  * integer literal.
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val bitsOk = right.foldable && right.dataType == IntegerType &&
      right.eval() != null && {
        val b = right.eval().asInstanceOf[Int]; b >= 1 && b <= 31
      }
    if (arrOk && bitsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, int literal in [1,31]), got " +
        s"${left.dataType.sql} and ${right.sql}")
  }

  override def dataType: DataType = IntegerType

  private lazy val bits: Int = right.eval().asInstanceOf[Int]

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val xa = arr.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n == 0) return null // degenerate vector: no meaningful bucket
    var bucket = 0
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 1
      while (i <= n) {
        if (xa.isNullAt(i - 1)) return null
        val v = if (isFloat) xa.getFloat(i - 1).toDouble else xa.getDouble(i - 1)
        proj += (if ((((j * 64L + i) * 1103515245L + 104729L) / 131072L) % 2 == 0) v else -v)
        i += 1
      }
      if (proj >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    val leftGen = left.genCode(ctx)
    val xa = leftGen.value
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val proj = ctx.freshName("proj")
    val bucket = ctx.freshName("bucket"); val v = ctx.freshName("v")
    val code =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |int ${ev.value} = 0;
         |if (!${ev.isNull}) {
         |  int $n = $xa.numElements();
         |  if ($n == 0) { ${ev.isNull} = true; }
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bits && !${ev.isNull}; $j++) {
         |    double $proj = 0.0;
         |    for (int $i = 1; $i <= $n; $i++) {
         |      if ($xa.isNullAt($i - 1)) { ${ev.isNull} = true; break; }
         |      double $v = (double) $xa.$acc($i - 1);
         |      $proj += (((($j * 64L + $i) * 1103515245L + 104729L) / 131072L) % 2L == 0L) ? $v : -$v;
         |    }
         |    if ($proj >= 0) $bucket |= (1 << $j);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $bucket; }
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_lsh_bucket"
}

object LshBucket {
  def apply(child: Expression, bits: Int): LshBucket =
    LshBucket(child, Literal(bits))
}
