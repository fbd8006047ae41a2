package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state K-minimum-values (KMV) distinct-count sketch: keeps
  * the k smallest DISTINCT hash values per group, sorted ascending.
  *
  * The scale tool for cardinality estimation over corpus-sized groups
  * (shuffle-width planning, dedup sizing): a `count(DISTINCT x)` must
  * move every distinct value through the shuffle, while this aggregate
  * carries at most k longs of state per group through an ordinary hash
  * aggregate with map-side combine. The estimator is downstream
  * arithmetic on the returned array: with U(k) = kth smallest hash
  * normalized to (0,1], n̂ = (k−1)/U(k) (standard KMV, ±n/√(k−2)
  * RMSE); a group with fewer than k distinct hashes returns them all
  * and its size IS the exact count.
  *
  * Determinism and portability: the sketch content is a pure function
  * of the input's distinct hash SET — insertion dedups on hash value,
  * so duplicate rows, partitioning and merge order cannot perturb it —
  * and the caller feeds an engine-portable hash (md5-derived integer),
  * so any SQL engine reproduces the sketch with a rank-over-distinct
  * query. No floating point anywhere in the aggregation.
  *
  * API INVARIANT: the hash column must be NON-NULL — a typed Long
  * aggregator decodes SQL NULL as 0, which would silently enter the
  * sketch as a real (and minimal) hash value. Filter nulls upstream,
  * as `sketch_kmv_distinct` does by hashing a non-null key. */
class KMinDistinctAgg(k: Int) extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {

  require(k >= 1, s"KMV sketch needs k >= 1, got $k")

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

  private def insert(b: ArrayBuffer[Long], h: Long): ArrayBuffer[Long] = {
    if (b.length == k && h >= b(k - 1)) return b
    // binary search: insertion point, or reject if already present
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.length && b(lo) == h) return b
    b.insert(lo, h)
    if (b.length > k) b.remove(k)
    b
  }

  override def reduce(b: ArrayBuffer[Long], h: Long): ArrayBuffer[Long] =
    insert(b, h)

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    b.foreach(insert(a, _))
    a
  }

  override def finish(b: ArrayBuffer[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[Long]] = Encoders.kryo
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
