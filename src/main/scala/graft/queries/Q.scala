package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark build function over the sf
  * directory plus (when SQL-expressible) the exact DuckDB oracle the
  * driver replays for the hash-equality correctness gate.
  *
  * Contract notes (driver compare is column-name-sorted value hashing):
  *  - every query ends with a fully deterministic ORDER BY;
  *  - aggregate doubles are rounded (both sides operate on the same
  *    IEEE double, so the rounding is bit-identical) or summed via
  *    DECIMAL (order-independent, see Deterministic.stableSum);
  *  - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    headline: Boolean = false)(
    val build: (SparkSession, String) => DataFrame)

object Q {
  /** Full registry, assembled per SURVEY §2 section. */
  def registry: Seq[Q] =
    QCore.all ++ QAgg.all ++ QWindowSet.all ++ QStats.all ++
      QText.all ++ QSim.all ++ QKernels.all ++ QMedia.all ++ QStream.all ++
      QGaps.all ++ QGaps2.all
}
