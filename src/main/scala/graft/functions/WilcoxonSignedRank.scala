package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

final case class WilcoxonStats(n_eff: Long, w_plus: Double, z: Double)

/** Wilcoxon signed-rank statistic (paired, two-sided, normal
  * approximation, average-rank ties, zero diffs dropped) as a reusable
  * typed `Aggregator` — the custom-aggregate declared in SURVEY §4's
  * custom-code inventory.
  * Ref: /root/reference/Cross_trial_session_level/cross_trial_type_cca_analysis.py:1317-1338.
  *
  * Scale shape: the group's nonzero diffs are buffered and ranked at
  * `finish` — the same O(group) memory the reference's in-memory test
  * uses — but the work happens inside an ordinary hash aggregate, so
  * unlike the window-rank formulation (`t2_wilcoxon_signed_rank`, which
  * sorts the whole relation through one rank window) every group is
  * ranked independently and groups parallelize across executors.
  *
  * All intermediates are dyadic rationals (integer ranks averaged over
  * ties), so the statistic is bit-identical to the SQL formulation
  * regardless of accumulation order.
  */
object WilcoxonSignedRank extends Aggregator[Double, List[Double], WilcoxonStats] {
  override def zero: List[Double] = Nil

  override def reduce(b: List[Double], d: Double): List[Double] =
    if (d != 0.0) d :: b else b

  override def merge(a: List[Double], b: List[Double]): List[Double] = a ::: b

  override def finish(buf: List[Double]): WilcoxonStats = {
    val n = buf.length
    if (n == 0) return WilcoxonStats(0L, 0.0, Double.NaN)
    val sorted = buf.toArray.sortBy(math.abs)
    var wplus = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && math.abs(sorted(j + 1)) == math.abs(sorted(i))) j += 1
      val avgRank = (i + j + 2) / 2.0 // == rank() + (tieCount − 1)/2, 1-based
      var k = i
      while (k <= j) { if (sorted(k) > 0) wplus += avgRank; k += 1 }
      i = j + 1
    }
    val nL = n.toLong
    val z = (wplus - nL * (nL + 1) / 4.0) /
      math.sqrt(nL * (nL + 1) * (2 * nL + 1) / 24.0)
    WilcoxonStats(nL, wplus, z)
  }

  override def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[WilcoxonStats] = Encoders.product[WilcoxonStats]
}
