package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation: maintain a keyed aggregate snapshot by
  * merging each new delta batch's partial aggregates instead of
  * recomputing over history — the only affordable shape once history
  * is 100 TB and a day's delta is 100 GB. Works for any algebraic
  * aggregate kept as its commutative sufficient statistics (counts,
  * DECIMAL sums, mins/maxes); the engine's DECIMAL stable-sum idiom
  * makes the merge EXACTLY equal to a full recompute, not just
  * approximately (decimal addition is associative, double addition is
  * not).
  *
  * Scale posture: the merge is one key-equi full-outer join between
  * the snapshot and the delta's partials — both already aggregated, so
  * the shuffle is O(distinct keys), not O(rows); with both sides
  * bucketed by key on disk it is shuffle-free.
  */
object Incremental {

  /** Merge two partial-aggregate frames with identical schemas:
    * full-outer join on `keys`, every other column summed with missing
    * side = 0 (counts and sums; extend per-column if mins/maxes are
    * carried). */
  def mergeAggregates(snap: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(snap.columns.sameElements(delta.columns),
      s"schema mismatch: ${snap.columns.mkString(",")} vs ${delta.columns.mkString(",")}")
    val measures = snap.columns.filterNot(keys.contains)
    val s = measures.foldLeft(snap)((d, c) => d.withColumnRenamed(c, s"__s_$c"))
    val t = measures.foldLeft(delta)((d, c) => d.withColumnRenamed(c, s"__d_$c"))
    val merged = s.join(t, keys, "full_outer")
    measures.foldLeft(merged) { (d, c) =>
      d.withColumn(c,
        coalesce(col(s"__s_$c"), lit(0)) + coalesce(col(s"__d_$c"), lit(0)))
    }.select((keys ++ measures).map(col): _*)
  }

  /** SCD2 historization: collapse a keyed change log into type-2
    * slowly-changing-dimension validity intervals. Consecutive events
    * with the SAME state merge into one interval; each state change
    * opens a new version with `valid_from` = its first event's
    * timestamp and closes the previous version (`valid_to` = the new
    * version's `valid_from` — closed-open intervals, NULL for the
    * current one). The standard build step for dimension tables fed by
    * CDC streams: downstream as-of joins (operators.AsOfJoin) resolve
    * any fact timestamp to the version valid at that instant.
    *
    * Scale shape: every window and aggregate is keyed on the dimension
    * key — one sort per key partition for the change detection, a
    * co-partitioned groupBy for the interval collapse, and a second
    * key-local window over the (much smaller) interval frame for the
    * closing timestamps. No corpus-wide sort, no driver state; a key's
    * history never leaves its partition. Ordering within a key is
    * (`tsCol`, `tieCols`…) — pass a unique tie-breaker for a total
    * order when timestamps can collide.
    *
    * Output: key cols + (version, state, valid_from, valid_to,
    * n_events, is_current), version 1-based per key. */
  def scd2Intervals(log: DataFrame, keyCols: Seq[String], stateCol: String,
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = (col(tsCol) +: tieCols.map(col)): Seq[org.apache.spark.sql.Column]
    val wOrd = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val versioned = log
      .withColumn("__prev", lag(col(stateCol), 1).over(wOrd))
      .withColumn("__chg",
        when(col("__prev").isNull || col("__prev") =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = versioned
      .groupBy((keyCols.map(col) :+ col("version")): _*)
      .agg(first(col(stateCol)).as("state"), min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col("version"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ Seq(col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("is_current"))): _*)
  }

  /** Snapshot-diff (CDC audit): classify every key as `added` /
    * `changed` / `unchanged` between an old snapshot (the rows
    * matching `oldPred`) and the current full frame. Because the old
    * snapshot is a predicate over the same frame, the diff is ONE
    * conditional-aggregation pass — per key, the old row count rides a
    * `count_if`, no self-join and no second scan. (A physically
    * separate old snapshot reduces to this shape after a unionByName
    * with a snapshot tag.) */
  def snapshotDiff(df: DataFrame, keyCols: Seq[String],
      oldPred: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(when(oldPred, 1)).as("n_old"), count(lit(1)).as("n_new"))
      .withColumn("status",
        when(col("n_old") === 0, "added")
          .when(col("n_old") === col("n_new"), "unchanged")
          .otherwise("changed"))
}
