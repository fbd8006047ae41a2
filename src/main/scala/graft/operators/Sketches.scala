package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch as a relational construction: a `depth × width`
  * counter table built with ONE hash-bucket aggregation, answering
  * point frequency queries with `est = min over rows of
  * counter[row][bucket(key, row)]` — always an over-estimate, error
  * ≤ ε·N with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉
  * (Cormode & Muthukrishnan 2005).
  *
  * Scale posture: the sketch build is a single `groupBy(row, bucket)`
  * count — map-side combine collapses each task's contribution to at
  * most `depth·width` cells before the shuffle, so the exchanged
  * volume is O(tasks · depth · width), independent of corpus size.
  * That is the whole point at 100 TB: token/key frequency estimation
  * whose shuffle does not grow with the data. Because cell counts are
  * sums, the sketch is merge-order-independent — fully deterministic
  * under any partitioning (unlike Misra–Gries style summaries, whose
  * contents depend on merge order).
  *
  * Hashing: h1 = first 8 md5 hex chars of the key (engine-portable,
  * same parse the minhash family uses — `Dedup` mixes), then
  * `bucket_i = ((h1·A_i + B_i) mod 2³¹) mod width` per sketch row.
  */
object Sketches {

  /** 31-bit base hash of a string column (engine-portable md5 parse). */
  def baseHash(key: Column): Column =
    conv(substring(md5(encode(key, "UTF-8")), 1, 8), 16, 10)
      .cast("long") % Dedup.mixM

  /** Bucket of `h1` in sketch row `row` (affine mix mod width). */
  def bucket(h1: Column, row: Int, width: Int): Column =
    (h1 * Dedup.mixA(row) + Dedup.mixB(row)) % Dedup.mixM % width

  /** Build the sketch over a string key column: one row per non-empty
    * counter cell, `(cms_row, cms_bucket, cnt)`. */
  def countMin(items: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    val h1 = baseHash(col(keyCol))
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("cms_row"), bucket(h1, r, width).as("cms_bucket"))): _*)
    items
      .select(explode(cells).as("cell"))
      .groupBy(col("cell.cms_row").as("cms_row"),
        col("cell.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimate each probe key's frequency from a built sketch: the probe
    * frame gains `n_est = min over rows of the probed cells`. The join
    * is probes×depth against depth·width cells — broadcast-sized on
    * the sketch side by construction. LEFT join + coalesce(0): a cell
    * no key hashed into is absent from the counter table but counts as
    * zero, so a never-seen probe key correctly estimates 0 instead of
    * minimizing over only its collided cells. */
  def estimate(cms: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val h1 = baseHash(col(keyCol))
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("cms_row"), bucket(h1, r, width).as("cms_bucket"))): _*)
    val probed = probes
      .withColumn("cell", explode(cells))
      .select(probes.columns.map(col) :+ col("cell.cms_row").as("cms_row")
        :+ col("cell.cms_bucket").as("cms_bucket"): _*)
    probed
      .join(broadcast(cms), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
