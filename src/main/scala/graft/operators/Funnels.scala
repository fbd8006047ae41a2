package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, type, time) log: ordered
  * conversion funnels and retention cohorts — the two standard
  * product/behavior reports a clickstream warehouse serves, and (for a
  * training-data pipeline) the shape of "did source S progress through
  * crawl → clean → pack" lineage audits.
  *
  * Scale posture: every stage keys on the USER column — the per-stage
  * aggregations and the stage-to-stage joins all cluster on the same
  * key, so one shuffle partitioning carries the whole funnel (AQE
  * reuses the exchange; no corpus-wide sort, no window over an
  * unbounded group). Retention is two aggregations on the same key
  * plus a cohort-sized roll-up.
  */
object Funnels {

  /** Ordered-funnel per-user stage times: for stages s₀ < s₁ < … the
    * user's `t_0` is their FIRST s₀ event, `t_i` the first sᵢ event
    * STRICTLY AFTER `t_{i−1}` (and within `windowSeconds` of it, when
    * set) — the standard ordered-conversion semantics with a per-leg
    * conversion window (a purchase before the first view does not
    * convert; one a month later usually shouldn't either). Returns one
    * row per user who completed stage 0, with `t_i` NULL from the
    * first uncompleted stage on.
    *
    * `typeCol` values are matched against `stages` literally; `tCol`
    * must be an integer epoch (seconds) column. Rows of other types
    * are ignored. */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tCol: String, stages: Seq[String],
      windowSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate funnel stage in $stages")
    windowSeconds.foreach(w => require(w >= 1, s"window must be >= 1, got $w"))
    val e = events.select(col(userCol), col(typeCol), col(tCol))
    val first = e.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tCol).as("t_0"))
    stages.zipWithIndex.tail.foldLeft(first) { case (acc, (s, i)) =>
      // same-key equi-join + same-key re-aggregation: stays in the
      // user_id clustering end to end
      val inWindow = windowSeconds
        .map(w => col(tCol) <= col(s"t_${i - 1}") + w)
        .getOrElse(lit(true))
      val next = e.filter(col(typeCol) === s)
        .join(acc.select(col(userCol), col(s"t_${i - 1}")), userCol)
        .filter(col(tCol) > col(s"t_${i - 1}") && inWindow)
        .groupBy(userCol).agg(min(tCol).as(s"t_$i"))
      acc.join(next, Seq(userCol), "left")
    }
  }

  /** Funnel summary: one row per stage — users reaching it (in order),
    * conversion from the previous stage and from stage 0, and the mean
    * seconds from the previous stage (completers only; integer-exact
    * sum, rounded once at the division). */
  def funnelReport(events: DataFrame, userCol: String, typeCol: String,
      tCol: String, stages: Seq[String],
      windowSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tCol, stages, windowSeconds)
    val aggs = stages.indices.flatMap { i =>
      Seq(count(col(s"t_$i")).as(s"n_$i")) ++
        (if (i == 0) Nil
         else Seq(sum(col(s"t_$i") - col(s"t_${i - 1}")).as(s"d_$i")))
    }
    val wide = times.agg(aggs.head, aggs.tail: _*)
    val legs = stages.zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) col("n_0") else col(s"n_${i - 1}")
      // NULLIF-style guards: a stage with zero completers makes every
      // downstream ratio 0/0 — Spark (ANSI off) yields NULL, DuckDB
      // IEEE division yields NaN/inf; the explicit NULL pins one
      // cross-engine answer (and the SQL leg mirrors it with NULLIF)
      wide.select(
        lit(i.toLong).as("stage_idx"), lit(s).as("stage"),
        col(s"n_$i").as("n_users"),
        when(prev > 0, round(col(s"n_$i").cast("double") / prev, 6))
          .as("conv_from_prev"),
        when(col("n_0") > 0, round(col(s"n_$i").cast("double") / col("n_0"), 6))
          .as("conv_from_first"),
        (if (i == 0) lit(null).cast("double")
         else when(col(s"n_$i") > 0,
           round(col(s"d_$i").cast("double") / col(s"n_$i"), 6)))
          .as("mean_seconds_from_prev"))
    }
    legs.reduce(_ unionByName _)
  }

  /** Retention cohorts: each user joins the cohort of their FIRST event
    * bucket (`t div bucketSeconds`), and every (cohort, offset) cell
    * counts the users active `offset` buckets later — the classic
    * triangular retention matrix. `retention` is the cell count over
    * the cohort's size (offset 0 ⇒ 1.0 by construction). All-integer
    * until the one rounded ratio. */
  def retentionCohorts(events: DataFrame, userCol: String, tCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val e = events.select(col(userCol),
      expr(s"$tCol div $bucketSeconds").as("bucket"))
    val cohorts = e.groupBy(userCol).agg(min("bucket").as("cohort"))
    val sizes = cohorts.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    e.join(cohorts, userCol) // same-key join: user clustering reused
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .join(broadcast(sizes), "cohort") // cohort-count-sized dimension
      .select(col("cohort"), col("offset"), col("n_active"),
        col("cohort_users"),
        round(col("n_active").cast("double") / col("cohort_users"), 6)
          .as("retention"))
  }
}
