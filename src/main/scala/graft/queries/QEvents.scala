package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Funnels

/** Event-sequence analytics (operators.Funnels): ordered conversion
  * funnels with per-leg windows and retention cohorts — the standard
  * behavioral reports over the event log, both clustering every stage
  * on the user key so one shuffle partitioning carries the whole
  * report.
  */
object QEvents {

  // --------------------------------------------------- ordered funnel
  /** view → click → purchase ordered funnel with a 1-day conversion
    * window per leg: a stage counts only events strictly after the
    * previous stage's first qualifying event and within the window —
    * the product-analytics semantics (and, for pipeline lineage, the
    * "did the batch progress crawl → clean → pack on schedule" audit).
    * Every per-stage aggregation and stage-to-stage join keys on
    * user_id; sums of second-deltas are BIGINT-exact, divided and
    * rounded once. */
  private val funnelStages = Seq("view", "click", "purchase")
  private val funnelWindow = 86400L

  val funnel = Q("funnel_ordered_stages", Some(s"""
    WITH e AS (SELECT user_id, event_type,
                 CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t FROM events),
    s0 AS (SELECT user_id, min(t) AS t_0 FROM e
           WHERE event_type = 'view' GROUP BY 1),
    s1 AS (SELECT e.user_id, min(t) AS t_1 FROM e JOIN s0 USING (user_id)
           WHERE event_type = 'click' AND t > t_0 AND t <= t_0 + $funnelWindow
           GROUP BY 1),
    s2 AS (SELECT e.user_id, min(t) AS t_2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'purchase' AND t > t_1 AND t <= t_1 + $funnelWindow
           GROUP BY 1),
    w AS (SELECT s0.user_id, t_0, t_1, t_2
          FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)),
    a AS (SELECT count(t_0) AS n_0, count(t_1) AS n_1, count(t_2) AS n_2,
                 CAST(sum(t_1 - t_0) AS BIGINT) AS d_1,
                 CAST(sum(t_2 - t_1) AS BIGINT) AS d_2 FROM w)
    SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, n_0 AS n_users,
           round(CAST(n_0 AS DOUBLE) / NULLIF(n_0, 0), 6) AS conv_from_prev,
           round(CAST(n_0 AS DOUBLE) / NULLIF(n_0, 0), 6) AS conv_from_first,
           CAST(NULL AS DOUBLE) AS mean_seconds_from_prev FROM a
    UNION ALL
    SELECT 1, 'click', n_1, round(CAST(n_1 AS DOUBLE) / NULLIF(n_0, 0), 6),
           round(CAST(n_1 AS DOUBLE) / NULLIF(n_0, 0), 6),
           round(CAST(d_1 AS DOUBLE) / NULLIF(n_1, 0), 6) FROM a
    UNION ALL
    SELECT 2, 'purchase', n_2, round(CAST(n_2 AS DOUBLE) / NULLIF(n_1, 0), 6),
           round(CAST(n_2 AS DOUBLE) / NULLIF(n_0, 0), 6),
           round(CAST(d_2 AS DOUBLE) / NULLIF(n_2, 0), 6) FROM a
    ORDER BY stage_idx"""
  ))((s, d) =>
    Funnels.funnelReport(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts").cast("long").as("t")),
        "user_id", "event_type", "t", funnelStages, Some(funnelWindow))
      .orderBy("stage_idx"))

  // ------------------------------------------------- retention cohorts
  /** Daily retention cohorts over the PURCHASE stream (the sparse
    * conversion event — the dense all-events stream saturates at
    * retention 1.0): cohort = day of a user's first purchase, each
    * (cohort, day-offset ≤ 6) cell counts users purchasing that day —
    * the classic triangular retention matrix, all-integer until the
    * one rounded ratio. Cohort sizes are a broadcast dimension. */
  private val retBucket = 86400L
  private val retMaxOffset = 6L

  val retention = Q("ret_daily_cohorts", Some(s"""
    WITH e AS (SELECT user_id,
                 CAST(epoch_us(ts) // 1000000 AS BIGINT) // $retBucket AS bucket
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, min(bucket) AS cohort FROM e GROUP BY 1),
    s AS (SELECT cohort, count(*) AS cohort_users FROM c GROUP BY 1),
    a AS (SELECT c.cohort, e.bucket - c.cohort AS day_offset,
                 count(DISTINCT e.user_id) AS n_active
          FROM e JOIN c USING (user_id) GROUP BY 1, 2)
    SELECT a.cohort AS cohort_day, a.day_offset, a.n_active, s.cohort_users,
           round(CAST(a.n_active AS DOUBLE) / s.cohort_users, 6) AS retention
    FROM a JOIN s USING (cohort)
    WHERE a.day_offset <= $retMaxOffset
    ORDER BY cohort_day, day_offset"""
  ))((s, d) =>
    Funnels.retentionCohorts(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").cast("long").as("t")),
        "user_id", "t", retBucket)
      .filter(col("offset") <= retMaxOffset)
      .select(col("cohort").as("cohort_day"), col("offset").as("day_offset"),
        col("n_active"), col("cohort_users"), col("retention"))
      .orderBy("cohort_day", "day_offset"))

  val all: Seq[Q] = Seq(funnel, retention)
}
