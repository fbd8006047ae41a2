package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Deterministic

/** Corpus sampling operators for training-data mixture construction.
  *
  * The core primitive is per-stratum Bernoulli sampling with the
  * engine's partition-invariant deterministic hash
  * ([[Deterministic.hrand01]]): "sample web at 12%, books at 80%" is
  * the domain-mixing step of every large-scale pre-training pipeline,
  * and keying the coin on a stable id (never `rand()`) makes the
  * sample reproducible across runs, cluster sizes and partitionings —
  * and exactly replayable by the SQL oracle.
  */
object Sampling {

  /** Per-stratum Bernoulli sample: keep a row of stratum `s` iff
    * hrand01(key) < rates(s) (strata absent from `rates` use
    * `defaultRate`). Pure row-wise filter — no shuffle, no sort, no
    * per-stratum pass; the rate lookup is a literal CASE chain over the
    * (small, fixed) strata map, evaluated in sorted-key order so the
    * plan is deterministic. Adds `sample_rate` to surviving rows.
    *
    * NULL semantics, stated: a NULL stratum falls through every CASE
    * arm to `defaultRate` (SQL null-equality is never true); a NULL
    * sampling key hashes to NULL, the `<` predicate is NULL, and the
    * row is DROPPED — key nullability is the caller's contract. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double, seed: Long): DataFrame = {
    (defaultRate +: rates.values.toSeq).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"sampling rate out of [0,1]: $r"))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("sample_rate", rate)
      .filter(Deterministic.hrand01(col(keyCol), seed) < col("sample_rate"))
  }
}
