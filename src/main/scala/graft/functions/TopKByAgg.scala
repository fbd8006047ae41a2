package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One candidate row for the top-k aggregators: the ranked value plus
  * two integer tie-break keys (ascending). */
final case class TopKRow(v: Double, k1: Long, k2: Long)

/** Bounded-state top-k selection: keeps the k rows ranking first by
  * (v DESC, k1 ASC, k2 ASC); concrete subclasses pick what `finish`
  * projects from the selected rows.
  *
  * The scale-safe replacement for `row_number() OVER (PARTITION BY g
  * ORDER BY …) <= k`: the window form shuffles and sorts every row of
  * the partition on one task (group size scales with the corpus), while
  * this aggregate carries at most k rows of state per group through an
  * ordinary hash aggregate with map-side combine — memory is O(k) per
  * group regardless of data volume.
  *
  * Determinism: (v, k1, k2) is a total order when (k1, k2) is unique,
  * so the selected set and its order are unique — no floating-point
  * accumulation happens here at all.
  */
abstract class TopKBaseAgg[OUT](k: Int)
    extends Aggregator[TopKRow, ArrayBuffer[TopKRow], OUT] {

  // k < 1 would otherwise surface as an opaque IndexOutOfBounds inside
  // executor tasks (insert touches b(k - 1)); fail at construction.
  require(k >= 1, s"top-k aggregation needs k >= 1, got $k")

  /** True when `a` ranks strictly before `b`. */
  private def before(a: TopKRow, b: TopKRow): Boolean =
    a.v > b.v || (a.v == b.v &&
      (a.k1 < b.k1 || (a.k1 == b.k1 && a.k2 < b.k2)))

  override def zero: ArrayBuffer[TopKRow] = ArrayBuffer.empty

  private def insert(b: ArrayBuffer[TopKRow], r: TopKRow): ArrayBuffer[TopKRow] = {
    if (b.length == k && before(b(k - 1), r)) return b
    var i = b.length
    while (i > 0 && before(r, b(i - 1))) i -= 1
    b.insert(i, r)
    if (b.length > k) b.remove(k)
    b
  }

  override def reduce(b: ArrayBuffer[TopKRow], r: TopKRow): ArrayBuffer[TopKRow] =
    insert(b, r)

  override def merge(a: ArrayBuffer[TopKRow], b: ArrayBuffer[TopKRow]): ArrayBuffer[TopKRow] = {
    b.foreach(insert(a, _))
    a
  }

  override def bufferEncoder: Encoder[ArrayBuffer[TopKRow]] = Encoders.kryo
}

/** Top-k VALUES in rank order — e.g. the top-3 amounts whose mean is a
  * capacity metric (a13). Downstream means over the returned array
  * should fold left-to-right (rank order), which matches the summation
  * order of both engines' windowed formulation. */
class TopKByAgg(k: Int) extends TopKBaseAgg[Seq[Double]](k) {
  override def finish(b: ArrayBuffer[TopKRow]): Seq[Double] = b.map(_.v).toSeq
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Top-k row KEYS (k1) in rank order — bounded-state deterministic
  * SAMPLING: rank by v = −hrand(key, seed) and the k1s returned are
  * the per-group seeded sample, selected with O(k) state instead of a
  * row_number window sorting each corpus-scaled group on one task
  * (w6's shape). hrand < 2^31 is exact in a double, so the ranking is
  * identical to the oracle's (hrand ASC, key ASC) ordering. */
class TopKKeysAgg(k: Int) extends TopKBaseAgg[Seq[Long]](k) {
  override def finish(b: ArrayBuffer[TopKRow]): Seq[Long] = b.map(_.k1).toSeq
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Top-k FULL ROWS (v, k1, k2) in rank order — for selections whose
  * downstream math needs both the ranked value and the row's payload
  * (e.g. priority sampling: the (k+1)-th priority is the estimator
  * threshold, k1 is the sampled id, k2 carries the weight). Same O(k)
  * bounded state as the other finishers. */
class TopKRowsAgg(k: Int) extends TopKBaseAgg[Seq[TopKRow]](k) {
  override def finish(b: ArrayBuffer[TopKRow]): Seq[TopKRow] = b.toSeq
  override def outputEncoder: Encoder[Seq[TopKRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKRow]]()
}
