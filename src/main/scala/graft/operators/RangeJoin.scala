package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range join — the reference's signature operator (J1).
  *
  * Semantics (from `/root/reference/Matlab_part/segment_mdl_to_trials.m:192-233`):
  * for each event at time τ, select all series rows with time in
  * `[τ - pre, τ + post]` and emit the relative offset `time - τ`.
  *
  * A naive `series.join(events, time.between(τ-pre, τ+post))` compiles
  * to a broadcast-nested-loop O(|series|·|events|) plan — fatal at
  * 100 TB. This implementation buckets both sides on
  * `floor(time / width)` with `width = pre + post + 1`: an event's
  * window then spans at most two consecutive buckets, so each event is
  * exploded to its (≤2) covered buckets and joined to the series on a
  * shuffle-friendly *equi*-key `(keys..., bucket)`, with a cheap
  * residual `between` filter. Linear candidate volume, hash-partitioned
  * both sides, AQE-skew-safe — survives a 100× scale-up where the
  * nested-loop plan does not.
  */
object RangeJoin {

  private def fdiv(c: Column, w: Long): Column =
    floor(c.cast("double") / w).cast("long")

  /** Generic bucketed range join.
    *
    * @param events  one row per event; must contain `eventTimeCol`
    * @param series  the long fact table; must contain `seriesTimeCol`
    * @param keys    equi-join key columns present on both sides (may be empty)
    * @param pre     units before the event (inclusive)
    * @param post    units after the event (inclusive)
    * @return series ⋈ events rows with an extra `rel_off` column = time − τ
    */
  def segment(
      events: DataFrame,
      series: DataFrame,
      keys: Seq[String],
      eventTimeCol: String,
      seriesTimeCol: String,
      pre: Long,
      post: Long): DataFrame = {
    require(pre >= 0 && post >= 0, "pre/post must be non-negative")
    val width = pre + post + 1
    val eb = events.withColumn(
      "__bucket",
      explode(sequence(
        fdiv(col(eventTimeCol) - pre, width),
        fdiv(col(eventTimeCol) + post, width))))
    val s = series.withColumn("__bucket", fdiv(col(seriesTimeCol), width))
    val cond: Column =
      keys.map(k => eb(k) === s(k))
        .foldLeft(eb("__bucket") === s("__bucket"))(_ && _) &&
        s(seriesTimeCol) >= eb(eventTimeCol) - pre &&
        s(seriesTimeCol) <= eb(eventTimeCol) + post
    val joined = s.join(eb, cond, "inner")
    val keyCols = keys.map(k => s(k).as(k))
    val seriesCols = series.columns.filterNot(keys.contains).map(c => s(c).as(c))
    val eventCols = events.columns.filterNot(keys.contains).map(c => eb(c).as(c))
    joined
      .select(keyCols ++ seriesCols ++ eventCols: _*)
      .withColumn("rel_off", col(seriesTimeCol) - col(eventTimeCol))
  }
}
