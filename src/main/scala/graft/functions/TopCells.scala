package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the top-`nProbe` IVF cells for a vector
  * against a broadcast centroid array —
  * `graft_top_cells(vec, cents, nProbe)` where `cents` is
  * `array<struct<cent_id, cv: array<float|double>>>` (the one-row roll-up
  * of Similarity.centroidArray). Output:
  * `array<struct<c: double, cent_id>>`, the `nProbe` centroids ranked by
  * (6-dp-rounded cosine DESC, cent_id ASC, NULL cosines last by id).
  *
  * Replaces the `slice(array_sort(transform(...)))` higher-order chain
  * (kept as Similarity.topCellsSql, the reference formulation this
  * expression is bit-tested against): HOF lambdas evaluate INTERPRETED
  * per element, so the assignment hot path paid an Expression-tree walk
  * per (row, centroid) — at the √n quantizer-sizing rule that inner
  * loop grows with corpus size, making it exactly the per-row cost that
  * matters at 100 TB. Here the whole rank-and-slice runs as one
  * compiled eval: a tight cosine loop (the kernel shared verbatim with
  * [[CosineSimilarity]], so per-centroid cosines are bit-identical to
  * `graft_cosine`), Spark's own `round(_, 6)` arithmetic
  * (BigDecimal.valueOf shortest-string HALF_UP, NaN/Inf passthrough),
  * and the same comparator the SQL lambda encoded. Results are
  * bit-identical to the HOF chain (spec-pinned in LibraryOpsSpec).
  *
  * Null contract (inherited from the HOF form): null `cents` → null
  * result; null `vec` (or null `cv` / null element / zero norm) → that
  * cosine is NULL, the struct still participates ranked to the back by
  * cent_id. Centroid struct ELEMENTS are assumed non-null with non-null
  * ids (`collect_list` never emits null elements).
  */
case class TopCells(vec: Expression, cents: Expression, nProbe: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = nProbe

  private def centsStruct: StructType =
    cents.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idOrd = centsStruct.fieldIndex("cent_id")
  private lazy val cvOrd = centsStruct.fieldIndex("cv")
  private def idType: DataType = centsStruct.fields(idOrd).dataType
  private def cvElemFloat: Boolean =
    centsStruct.fields(cvOrd).dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def vecElemFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def numArray(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val ok = numArray(vec.dataType) &&
      (cents.dataType match {
        case ArrayType(st: StructType, _) =>
          st.fieldNames.contains("cent_id") && st.fieldNames.contains("cv") &&
            (idType == LongType || idType == IntegerType) &&
            numArray(st.fields(st.fieldIndex("cv")).dataType)
        case _ => false
      }) && nProbe.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, array<struct<cent_id: int|bigint, " +
        s"cv: array<float|double>>>, int), got ${vec.dataType.sql}, " +
        s"${cents.dataType.sql}, ${nProbe.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("c", DoubleType, nullable = true),
    StructField("cent_id", idType, nullable = false))), containsNull = false)

  override def nullable: Boolean = cents.nullable

  /** Spark's `round(double, 6)`: shortest-decimal-string HALF_UP with
    * NaN/±Inf passthrough — replicated so ranking matches the
    * `round(graft_cosine(...), 6)` the HOF form (and the oracle) uses. */
  private def round6(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  override def eval(input: InternalRow): Any = {
    val centsAny = cents.eval(input)
    if (centsAny == null) return null
    val vecAny = vec.eval(input)
    val np = nProbe.eval(input).asInstanceOf[Int]
    val ca = centsAny.asInstanceOf[ArrayData]
    val n = ca.numElements()
    val cos = new Array[java.lang.Double](n)
    val ids = new Array[Long](n)
    val va = if (vecAny == null) null else vecAny.asInstanceOf[ArrayData]
    val vf = vecElemFloat
    val cf = cvElemFloat
    val intIds = idType == IntegerType
    var k = 0
    while (k < n) {
      val st = ca.getStruct(k, centsStruct.length)
      ids(k) = if (intIds) st.getInt(idOrd).toLong else st.getLong(idOrd)
      val cv = if (st.isNullAt(cvOrd)) null else st.getArray(cvOrd)
      val c = if (va == null || cv == null) null
        else CosineSimilarity.cosine(va, vf, cv, cf)
      cos(k) = if (c == null) null else java.lang.Double.valueOf(round6(c))
      k += 1
    }
    // (rounded c DESC, cent_id ASC), NULL c last by cent_id — the exact
    // comparator of the HOF reference formulation
    def before(i: Int, j: Int): Boolean = {
      val ci = cos(i); val cj = cos(j)
      if (ci == null && cj == null) ids(i) < ids(j)
      else if (ci == null) false
      else if (cj == null) true
      else if (ci.doubleValue > cj.doubleValue) true
      else if (ci.doubleValue < cj.doubleValue) false
      else ids(i) < ids(j)
    }
    val order = Array.range(0, n).sortWith(before)
    val take = math.max(0, math.min(np, n))
    val out = new Array[Any](take)
    var o = 0
    while (o < take) {
      val i = order(o)
      out(o) = InternalRow(cos(i),
        if (intIds) ids(i).toInt else java.lang.Long.valueOf(ids(i)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, cents = s, nProbe = t)

  override def prettyName: String = "graft_top_cells"
}
