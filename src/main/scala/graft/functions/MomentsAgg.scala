package graft.functions

import java.math.BigDecimal

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[MomentsAgg]]: counts + exact decimal sums (first-order
  * and packed upper-triangle second-order). Kryo-serialized between
  * partial and final aggregation. */
final class MomentsBuf(val dims: Int) extends Serializable {
  var n: Long = 0L
  var bad: Long = 0L
  val s: Array[BigDecimal] = Array.fill(dims)(BigDecimal.ZERO)
  val m: Array[BigDecimal] = Array.fill(dims * (dims + 1) / 2)(BigDecimal.ZERO)
}

/** Finished moments: row count, poison-row count, first-order sums,
  * packed second-order sums (NaN-flooded when any row was poison). */
final case class MomentsOut(n: Long, bad: Long, s: Seq[Double], m: Seq[Double])

/** Exact order-invariant sufficient-statistics aggregate over a
  * length-`dims` vector column: n, first-order sums Σxᵢ and packed
  * upper-triangle second-order sums Σxᵢxⱼ.
  *
  * Determinism: every double is a finite decimal, `new BigDecimal
  * (double)` is its EXACT value, and exact decimal addition is
  * associative/commutative — so any partition layout or merge order
  * produces the bit-identical result, with zero truncation (stronger
  * than the DECIMAL(38,18) column form, which truncates each term at
  * 1e-18). One aggregate expression regardless of dimension: the
  * wide-column formulation planned 150+ aggregate columns for dims=16
  * and paid seconds of per-build analysis + codegen + AQE re-planning,
  * which dwarfed the actual work.
  *
  * Poison contract: a row with any NaN/±Inf/|x| ≥ 1e9 element (the
  * decimal-guard overflow bound on pairwise products) is counted in
  * `bad` and excluded from the sums; `finish` floods all moments NaN
  * when bad > 0 — per-ROW, strictly more conservative than the
  * per-term guard it replaces.
  */
class MomentsAgg(dims: Int) extends Aggregator[Seq[Double], MomentsBuf, MomentsOut] {

  override def zero: MomentsBuf = new MomentsBuf(dims)

  override def reduce(b: MomentsBuf, v: Seq[Double]): MomentsBuf = {
    b.n += 1
    var i = 0
    var rowBad = false
    while (i < dims && !rowBad) {
      val x = v(i)
      if (x.isNaN || math.abs(x) >= 1e9) rowBad = true
      i += 1
    }
    if (rowBad) { b.bad += 1; return b }
    val vd = new Array[BigDecimal](dims)
    i = 0
    while (i < dims) { vd(i) = new BigDecimal(v(i)); i += 1 }
    var idx = 0
    i = 0
    while (i < dims) {
      b.s(i) = b.s(i).add(vd(i))
      var j = i
      while (j < dims) {
        b.m(idx) = b.m(idx).add(new BigDecimal(v(i) * v(j)))
        j += 1; idx += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
    a.n += b.n; a.bad += b.bad
    var i = 0
    while (i < dims) { a.s(i) = a.s(i).add(b.s(i)); i += 1 }
    i = 0
    while (i < a.m.length) { a.m(i) = a.m(i).add(b.m(i)); i += 1 }
    a
  }

  override def finish(b: MomentsBuf): MomentsOut =
    if (b.bad > 0)
      MomentsOut(b.n, b.bad,
        Seq.fill(dims)(Double.NaN), Seq.fill(b.m.length)(Double.NaN))
    else
      MomentsOut(b.n, b.bad,
        b.s.toSeq.map(_.doubleValue), b.m.toSeq.map(_.doubleValue))

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.kryo[MomentsBuf]
  override def outputEncoder: Encoder[MomentsOut] = Encoders.product[MomentsOut]
}
