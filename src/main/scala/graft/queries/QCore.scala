package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Deterministic._
import graft.operators.RangeJoin

/** Sources (S3), filters (F1–F12), joins (J1–J9) — SURVEY §2.1–§2.3,
  * instantiated on the driver's generic star schema.
  */
object QCore {

  /** Shared: events with integer epoch seconds (time axis = integer
    * bins, like the reference's 50 Hz bin index — SURVEY §1.2). Spark
    * truncates parquet ns timestamps to µs exactly as DuckDB does, so
    * `unix_micros/1e6` is cross-engine exact. */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn(
      "t", (unix_micros(col("ts")) / lit(1000000L)).cast("long"))

  private val evSql =
    "SELECT *, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t FROM events"

  // ---------------------------------------------------------------- S3
  /** Glob source discovery + filename-derived column.
    * Ref: Single_trial_level/CCA_test_all.py:187-192. */
  val s3Glob = Q("s3_glob_source", Some(
    "SELECT 'lineitem' AS src, count(*) AS n FROM lineitem"
  ))((s, d) =>
    s.read.parquet(s"$d/lineitem*.parquet")
      // filename → table name without a per-row regex: two
      // substring_index calls are ~2× cheaper than regexp_extract on a
      // 600k-row full pass, same result ("…/lineitem.parquet" → "lineitem")
      .withColumn("src",
        substring_index(substring_index(input_file_name(), "/", -1), ".", 1))
      .groupBy("src").agg(count(lit(1)).as("n"))
      .orderBy("src"))

  // ---------------------------------------------------------------- F1
  /** Equality/disjunction filter (session filter analog).
    * Ref: Matlab_part/segment_mdl_to_trials.m:116-136. */
  val f1 = Q("f1_equality_filter", Some("""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING' AND (c_nationkey = 5 OR c_nationkey = 10 OR c_acctbal < 0)
    ORDER BY c_custkey"""
  ))((s, d) =>
    Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING" &&
        (col("c_nationkey") === 5 || col("c_nationkey") === 10 || col("c_acctbal") < 0))
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .orderBy("c_custkey"))

  // ---------------------------------------------------------------- F3
  /** Boundary-validity filter: keep events whose full window
    * [t-600, t+300] lies inside the recorded time span.
    * Ref: Matlab_part/segment_mdl_to_trials.m:200-231. */
  val f3 = Q("f3_boundary_filter", Some(s"""
    WITH e AS ($evSql), b AS (SELECT min(t) AS mn, max(t) AS mx FROM e)
    SELECT e.event_id, e.t FROM e, b
    WHERE e.t - 600 >= b.mn AND e.t + 300 <= b.mx
    ORDER BY e.event_id"""
  ))((s, d) => {
    val e = ev(s, d)
    val b = e.agg(min("t").as("mn"), max("t").as("mx"))
    e.crossJoin(broadcast(b))
      .filter(col("t") - 600 >= col("mn") && col("t") + 300 <= col("mx"))
      .select("event_id", "t").orderBy("event_id")
  })

  // ---------------------------------------------------------------- F6
  /** Group-count HAVING gate + semi join (min-neurons-per-region).
    * Ref: Matlab_part/perform_region_analysis.m:43-75. */
  val f6 = Q("f6_having_semijoin", Some("""
    SELECT c_custkey, c_nationkey FROM customer
    WHERE c_nationkey IN (
      SELECT c_nationkey FROM customer GROUP BY 1 HAVING count(*) >= 5)
    ORDER BY c_custkey"""
  ))((s, d) => {
    val c = Tables.customer(s, d)
    val ok = c.groupBy("c_nationkey").count().filter(col("count") >= 5)
    c.join(ok.select("c_nationkey"), Seq("c_nationkey"), "left_semi")
      .select("c_custkey", "c_nationkey").orderBy("c_custkey")
  })

  // ----------------------------------------------------------- F10/T9
  /** Percentile significance threshold (discrete 90th pct per group) +
    * count above, via a distinct-value histogram: ONE fact scan
    * aggregates (group, value) → count, and the rank-k selection plus
    * the strictly-above count both read off cumulative counts over the
    * histogram. The k-th-smallest VALUE ignores which duplicate holds
    * rank k, so the row-level tie-break (l_orderkey, l_linenumber) in
    * the oracle's formulation cannot change the result. The window now
    * runs over DISTINCT values per group (bounded by the 2-dp price
    * domain), not corpus rows — the previous form sorted every row of a
    * return-flag partition on one task and scanned the fact twice.
    * Counts are exact longs; the threshold double is selected, never
    * accumulated. Ref: Matlab_part/perform_session_cca.m:154-156. */
  val f10 = Q("f10_percentile_threshold", Some("""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
    thr AS (
      SELECT l_returnflag, l_extendedprice AS threshold, n
      FROM r WHERE rn = CAST(CEIL(0.9 * n) AS BIGINT))
    SELECT t.l_returnflag, t.threshold, t.n,
           (SELECT count(*) FROM lineitem l
            WHERE l.l_returnflag = t.l_returnflag
              AND l.l_extendedprice > t.threshold) AS n_above
    FROM thr t ORDER BY t.l_returnflag"""
  ))((s, d) => {
    val hist = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("l_returnflag")
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wTot))
      .withColumn("k", ceil(lit(0.9) * col("n")).cast("long"))
      .filter(col("cum") - col("c") < col("k") && col("k") <= col("cum"))
      .select(col("l_returnflag"), col("l_extendedprice").as("threshold"),
        col("n"), (col("n") - col("cum")).as("n_above"))
      .orderBy("l_returnflag")
  })

  // ---------------------------------------------------------------- J1
  /** The signature interval join: event-window segmentation (PSTH-style
    * roll-up of observations around trigger events). Bucketed
    * equi-join implementation — see operators.RangeJoin.
    * Ref: Matlab_part/segment_mdl_to_trials.m:192-233. */
  val j1 = Q("j1_event_window_segment", Some(s"""
    WITH e AS ($evSql),
    trg AS (SELECT event_id AS trig_id, user_id, t AS trig_t FROM e WHERE event_type = 'purchase'),
    ser AS (SELECT user_id, t AS obs_t, value FROM e WHERE event_type = 'click')
    SELECT CAST(FLOOR((ser.obs_t - trg.trig_t) / 60.0) AS BIGINT) AS rel_bin,
           count(*) AS n,
           round(${stableSumSql("ser.value")} / count(ser.value), 4) AS avg_value,
           count(DISTINCT trg.trig_id) AS n_trials
    FROM ser JOIN trg ON ser.user_id = trg.user_id
      AND ser.obs_t >= trg.trig_t - 600 AND ser.obs_t <= trg.trig_t + 300
    GROUP BY 1 ORDER BY 1"""), headline = true)((s, d) => {
    val e = ev(s, d)
    val trg = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("trig_id"), col("user_id"), col("t").as("trig_t"))
    val ser = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("obs_t"), col("value"))
    RangeJoin.segment(trg, ser, Seq("user_id"), "trig_t", "obs_t", 600, 300)
      .withColumn("rel_bin", floor(col("rel_off") / lit(60.0)).cast("long"))
      .groupBy("rel_bin")
      // bin mean via the exact decimal sum, NOT avg(): the j10 boundary
      // class — a double-avg whose 4-dp rounding can land on a .xxxx5
      // boundary at SOME scale, where the two engines' accumulation
      // orders disagree. stableSum makes both round the same double.
      .agg(count(lit(1)).as("n"),
        round(stableSum(col("value")) / count(col("value")), 4).as("avg_value"),
        countDistinct(col("trig_id")).as("n_trials"))
      .orderBy("rel_bin")
  })

  // ----------------------------------------------------------- J2/J7
  /** Positional zip: align two tables by rank WITHIN a session-like
    * group (nation), natural min-length truncation via inner join.
    * The reference zips per session, never globally
    * (Matlab_part/extract_session_data_mdl.m:141-151) — the partitioned
    * window keeps every rank computation parallel at scale (no
    * single-task global sort). */
  val j2 = Q("j2_positional_zip", Some("""
    WITH a AS (SELECT c_nationkey AS grp,
                      row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn,
                      c_custkey, c_acctbal FROM customer),
         b AS (SELECT s_nationkey AS grp,
                      row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn,
                      s_suppkey, s_acctbal FROM supplier)
    SELECT a.grp, a.rn, a.c_custkey, b.s_suppkey,
           round(a.c_acctbal + b.s_acctbal, 2) AS pair_bal
    FROM a JOIN b ON a.grp = b.grp AND a.rn = b.rn ORDER BY a.grp, a.rn"""
  ))((s, d) => {
    val a = Tables.customer(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_nationkey").orderBy("c_custkey")))
      .select(col("c_nationkey").as("grp"), col("rn"), col("c_custkey"), col("c_acctbal"))
    val b = Tables.supplier(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("s_nationkey").orderBy("s_suppkey")))
      .select(col("s_nationkey").as("grp"), col("rn"), col("s_suppkey"), col("s_acctbal"))
    a.join(b, Seq("grp", "rn"))
      .select(col("grp"), col("rn"), col("c_custkey"), col("s_suppkey"),
        round(col("c_acctbal") + col("s_acctbal"), 2).as("pair_bal"))
      .orderBy("grp", "rn")
  })

  // --------------------------------------------------------------- J10
  /** AS-OF join (latest-preceding event): every click attributed to
    * the newest purchase at-or-before it for the same user, rolled up
    * into a lag-bucket distribution. The reference's trial alignment
    * picks the nearest preceding trigger the same way
    * (Matlab_part/segment_mdl_to_trials.m:84-110 nearest-onset logic);
    * Spark has no native as-of join — `operators.AsOfJoin` runs the
    * tagged-union single-shuffle plan, and DuckDB's native ASOF JOIN
    * replays the exact inclusive latest-preceding contract. Purchases
    * are pre-deduped per (user, t): an equal-time tie makes any
    * engine's as-of selection arbitrary. */
  val j10 = Q("j10_asof_attribution", Some(s"""
    WITH e AS ($evSql),
    trg AS (SELECT user_id, t, max(event_id) AS trig_id
            FROM e WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY 1, 2),
    ser AS (SELECT user_id, t, value FROM e WHERE event_type = 'click' AND user_id IS NOT NULL)
    SELECT CAST(FLOOR((ser.t - trg.t) / 600.0) AS BIGINT) AS lag_bucket,
           count(*) AS n,
           round(${stableSumSql("ser.value")} / count(ser.value), 4) AS avg_value
    FROM ser ASOF JOIN trg ON ser.user_id = trg.user_id AND ser.t >= trg.t
    GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    val e = ev(s, d)
    val trg = e.filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .groupBy("user_id", "t").agg(max("event_id").as("trig_id"))
      .withColumn("trig_t", col("t"))
    val ser = e.filter(col("event_type") === "click" && col("user_id").isNotNull)
      .select("user_id", "t", "value")
    graft.operators.AsOfJoin
      .latestPreceding(ser, trg, Seq("user_id"), "t", "t", Seq("trig_id", "trig_t"))
      .filter(col("trig_id").isNotNull) // inner as-of: drop unattributed clicks
      .groupBy(floor((col("t") - col("trig_t")) / 600.0).cast("long").as("lag_bucket"))
      // bucket mean via the exact decimal sum, NOT avg(): at sf0.1 six
      // bucket means land ON a .xxxx5 4-dp boundary, and the two
      // engines' double-avg accumulation orders put the pre-round value
      // on opposite sides — the order-invariant sum makes both sides
      // round the SAME IEEE double (the s4/s5 stableSum discipline)
      .agg(count(lit(1)).as("n"),
        round(stableSum(col("value")) / count(col("value")), 4).as("avg_value"))
      .orderBy("lag_bucket")
  })

  // -------------------------------------------------------- J4/J5/C1
  /** Canonical pair key with swap flag over a multi-way analytic join
    * (customer-nation × supplier-nation through orders+lineitem).
    * Ref: cross_trial_type_cca_analysis.py:480-535 (reversed-pair
    * lookup), oxford_GLM_CCA_coefficients_extract.m:176-182. */
  val j4 = Q("j4_canonical_pair", Some("""
    WITH f AS (
      SELECT cn.n_name AS cn, sn.n_name AS sn,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
    SELECT least(cn, sn) || '_' || greatest(cn, sn) AS pair,
           count(*) AS n,
           CAST(SUM(CASE WHEN cn > sn THEN 1 ELSE 0 END) AS BIGINT) AS n_swapped,
           CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM f GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val f = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // customer scales with SF: no hint, AQE decides
      .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_name").as("cn"))),
        c("c_nationkey") === col("cnk"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("sn"))),
        sup("s_nationkey") === col("snk"))
      .select(col("cn"), col("sn"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    f.groupBy(concat_ws("_", least(col("cn"), col("sn")), greatest(col("cn"), col("sn"))).as("pair"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cn") > col("sn"), 1L).otherwise(0L)).as("n_swapped"),
        stableSum(col("rev")).as("revenue"))
      .orderBy("pair")
  })

  // ---------------------------------------------------------------- J6
  /** Self θ-join pair generation (all region pairs i < j) with pair
    * cardinality. Ref: Matlab_part/perform_region_analysis.m:82-99. */
  val j6 = Q("j6_self_theta_pairs", Some("""
    WITH rc AS (SELECT r.r_name, count(*) AS n_nations
                FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
                GROUP BY 1)
    SELECT a.r_name AS region_a, b.r_name AS region_b,
           a.n_nations * b.n_nations AS n_pairs
    FROM rc a JOIN rc b ON a.r_name < b.r_name
    ORDER BY 1, 2"""
  ))((s, d) => {
    val rc = Tables.region(s, d)
      .join(Tables.nation(s, d),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
    val a = rc.select(col("r_name").as("region_a"), col("n_nations").as("na"))
    val b = rc.select(col("r_name").as("region_b"), col("n_nations").as("nb"))
    a.join(b, col("region_a") < col("region_b"))
      .select(col("region_a"), col("region_b"), (col("na") * col("nb")).as("n_pairs"))
      .orderBy("region_a", "region_b")
  })

  // ---------------------------------------------------------------- J9
  /** Taxonomy join + cross-group gate: roll pair analytics up a
    * hierarchy, dropping within-group pairs.
    * Ref: cross_trial_type_cca_analysis.py:1718-1751. */
  val j9 = Q("j9_taxonomy_rollup", Some("""
    SELECT cr.r_name AS region_c, sr.r_name AS region_s, count(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    WHERE cr.r_name <> sr.r_name
    GROUP BY 1, 2 ORDER BY 1, 2"""
  ))((s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    // customer side taxonomy (broadcast dims)
    val cTax = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region_c"))
    val sTax2 = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name").as("region_s"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(cTax, o("o_custkey") === cTax("c_custkey")) // cTax/sTax2 are customer/supplier-scaled
      .join(sTax2, li("l_suppkey") === sTax2("s_suppkey"))
      .filter(col("region_c") =!= col("region_s"))
      .groupBy("region_c", "region_s")
      .agg(count(lit(1)).as("n"),
        stableSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("region_c", "region_s")
  })

  val all: Seq[Q] = Seq(s3Glob, f1, f3, f6, f10, j1, j2, j4, j6, j9, j10)
}
