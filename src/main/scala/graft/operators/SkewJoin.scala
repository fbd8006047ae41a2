package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy-hitter keys (SCALE.md §Joins). AQE's
  * skew-join split handles sort-merge skew at runtime, but only for
  * sizes it can observe per shuffle block; a key hot enough to swamp a
  * single task even after AQE splitting — or a skewed join feeding an
  * operator AQE cannot re-plan — needs the classic remedy: spread each
  * hot key over `factor` sub-partitions by salting.
  *
  * The skewed (large) side gets a DETERMINISTIC per-row salt in
  * [0, factor) — `pmod(hash(all columns), factor)`, so replays and
  * retries land identically (no `rand()`: partition-layout-dependent
  * randomness breaks speculative execution and the engine's
  * reproducibility contract). The build (small-ish) side is replicated
  * once per salt value via a literal explode. The join then runs on
  * (keys…, salt): each originally-single hot-key partition becomes
  * `factor` parallel tasks.
  *
  * Cost model: replicates the build side ×factor through the shuffle —
  * use for skewed-big ⋈ medium joins where the build side is too big to
  * broadcast but cheap to replicate a handful of times.
  */
object SkewJoin {

  /** Inner equi-join on `keys` with the left side salted `factor` ways.
    * Result is row-for-row identical to `left.join(right, keys)`. */
  def saltedInner(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
