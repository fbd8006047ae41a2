package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planning diagnostics: the statistics a 100 TB job needs BEFORE it
  * picks a physical strategy. Key-skew summaries answer "does this
  * join/aggregation need salting (operators.SkewJoin) or AQE skew
  * handling, and how wide should the shuffle be" — cheaply, from one
  * aggregation pass, instead of discovering the skew as a straggler
  * task an hour into the run.
  */
object Diagnostics {

  /** One-row skew summary of `keyCol` in `df`: key count, row count,
    * heaviest-key count, mean count, skew ratio (max/mean — 1.0 is
    * perfectly uniform), and the heaviest key's share of all rows.
    * Two aggregations (per-key, then global) — shuffle is O(distinct
    * keys) with map-side combine, never O(rows). */
  def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      .select(lit(label).as("keyspace"),
        col("n_keys"), col("n_rows"), col("max_cnt"),
        round(col("n_rows").cast("double") / col("n_keys"), 6).as("avg_cnt"),
        round(col("max_cnt") * col("n_keys").cast("double") / col("n_rows"), 6)
          .as("skew_ratio"),
        round(col("max_cnt").cast("double") / col("n_rows"), 6).as("top_share"))
}
