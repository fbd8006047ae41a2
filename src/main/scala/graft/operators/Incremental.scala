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
