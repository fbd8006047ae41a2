package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group each key's event
  * stream into sessions separated by silence gaps longer than
  * `gapSeconds` — the batch twin of the streaming
  * `StreamOps.sessionize` (flatMapGroupsWithState), sharing its
  * session semantics so a backfill over historical data and the live
  * stream agree row for row.
  *
  * Reference analog: per-session trial segmentation before
  * cross-session pooling (the reference slices per-session event
  * streams into trials before aggregating across sessions).
  *
  * Scale posture: ONE shuffle on the key column (the two window
  * functions and the final session aggregation all share the
  * `partitionBy(key)` clustering, so Catalyst plans a single exchange);
  * per-key state is a sort within the partition, never a driver
  * collect. Skewed keys are bounded by per-user event counts — at
  * 100 TB the partition count rides `spark.sql.shuffle.partitions`
  * and AQE, not the user count.
  *
  * Determinism: session boundaries depend only on the ordered set of
  * event times per key (ties in `tCol` land in the same session no
  * matter the order — a tie's gap is 0), so labels are
  * partition-invariant.
  */
object Sessionize {

  /** Label every row with its 0-based `session_id` per key. `tCol`
    * must be a BIGINT epoch-seconds column (cast upstream; keeping the
    * contract integer makes the gap compare exact on every engine). */
  def label(df: DataFrame, keyCol: String, tCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(tCol)
    val brk = when(lag(col(tCol), 1).over(byKey).isNull
        .or(col(tCol) - lag(col(tCol), 1).over(byKey) > gapSeconds), 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(brk).over(byKey.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
  }

  /** Per-session summary: start/end/count plus caller-supplied extra
    * aggregates (already-aliased columns). */
  def summarize(df: DataFrame, keyCol: String, tCol: String,
      gapSeconds: Long, extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = Seq(
      min(col(tCol)).as("session_start"),
      max(col(tCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ extraAggs
    label(df, keyCol, tCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
