package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Mutual information between two categorical columns (nats), with
    * the marginal entropies and the conditional entropy H(x|y) —
    * "how much does knowing the source tell you about the language":
    * the dependence audit that says whether a stratified sample over
    * one column implicitly stratifies the other, and whether a
    * (x, y)-keyed layout is redundant. MI = Σ p(x,y)·ln(p(x,y)/(p(x)
    * p(y))) over the OBSERVED cells (absent cells contribute 0 — the
    * limit of p·ln p at 0).
    *
    * Shape: one corpus aggregate to the r×c contingency table, all
    * information math on that category-bounded frame (marginals via
    * windows over it). Per-cell terms are rounded then DECIMAL-summed,
    * so every reported number is bit-stable across partitionings and
    * engines. Output (one row): n_rows, h_x, h_y, mi_nats,
    * h_x_given_y, redundancy = MI/min(H) (0 = independent,
    * 1 = one determines the other; 0 when min(H) = 0). */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    // NULL categories are excluded from the WHOLE computation (cells,
    // marginals, n_rows): the MI sum joins cells to marginals on
    // equality, which can never match a NULL key, so keeping NULLs in
    // the marginals/entropies while they silently vanish from the MI
    // term made mi_nats/h_x_given_y/redundancy internally inconsistent
    // on corpora with NULL keys (r8 ADVICE). A caller who wants NULL as
    // a real category coalesces to a sentinel before calling.
    val cells = CacheScope.persist(
      df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
        .groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("c")))
    val tot = cells.agg(sum("c").as("n"))
    def margEnt(k: String, out: String): DataFrame =
      cells.groupBy(col(k)).agg(sum("c").as("ck"))
        .crossJoin(broadcast(tot))
        .select(round(-(col("ck").cast("double") / col("n"))
          * log(col("ck").cast("double") / col("n")), 6).as("t"))
        .agg(sum(col("t").cast(dec)).cast("double").as(out))
    val mx = cells.groupBy(col(xCol)).agg(sum("c").as("cx"))
    val my = cells.groupBy(col(yCol)).agg(sum("c").as("cy"))
    val mi = cells.join(broadcast(mx), xCol).join(broadcast(my), yCol)
      .crossJoin(broadcast(tot))
      .select(round((col("c").cast("double") / col("n"))
        * log(col("c").cast("double") * col("n")
          / (col("cx").cast("double") * col("cy"))), 6).as("t"))
      .agg(sum(col("t").cast(dec)).cast("double").as("mi"))
    tot.crossJoin(broadcast(margEnt(xCol, "hx")))
      .crossJoin(broadcast(margEnt(yCol, "hy")))
      .crossJoin(broadcast(mi))
      .select(col("n").as("n_rows"),
        round(col("hx"), 6).as("h_x"), round(col("hy"), 6).as("h_y"),
        round(col("mi"), 6).as("mi_nats"),
        round(col("hx") - col("mi"), 6).as("h_x_given_y"),
        round(when(least(col("hx"), col("hy")) > 0,
          col("mi") / least(col("hx"), col("hy"))).otherwise(0.0), 6)
          .as("redundancy"))
  }

  /** Per-group Shannon entropy of a categorical column (nats), plus
    * the effective category count e^H — the corpus-diversity audit
    * (e.g. language mix per source). Each category's −p·ln p term is
    * rounded then DECIMAL-summed, so the entropy is bit-stable across
    * partitionings and replayable by external engines. Two keyed
    * aggregations — shuffle is O(groups·categories). */
  def categoryEntropy(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    // internal aliases are __-prefixed so user column names can't collide
    val counts = df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__cc"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("__cc")).as("__n"), count(lit(1)).as("n_cats"))
    val p = col("__cc").cast("double") / col("__n")
    counts.join(totals, groupCol)
      .select(col(groupCol), col("__n").as("n"), col("n_cats"),
        round(-p * log(p), 6).as("term"))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n_rows"), max(col("n_cats")).as("n_cats"),
        sum(col("term").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double").as("entropy"))
      .withColumn("eff_cats", round(exp(col("entropy")), 6))
  }

  /** Population-stability-index drift of a numeric column against a
    * REFERENCE group — the production data-QA monitor ("is today's
    * crawl/feed distributed like the corpus we validated on"):
    * PSI = Σ_k (q'_k − p'_k)·ln(q'_k/p'_k) over `bins` reference-decile
    * buckets, with the conventional reading psi < 0.1 stable,
    * 0.1–0.2 moderate, > 0.2 drifted. Complements the KS test (t12):
    * KS answers "same distribution?" per pair with a p-value; PSI is
    * the binned, thresholded index dashboards track per period.
    *
    * Determinism & portability: bucket CUT POINTS are the max value of
    * each reference ntile (ordered by value — a total order on the
    * value lattice; the max of tile t is the value at sorted position
    * k_t = t·(n div bins) + min(t, n mod bins), well-defined on the
    * value multiset regardless of tie placement); BOTH legs then
    * re-assign rows by the same `1 + #{cuts < v}` rule, so reference
    * shares are computed under the identical assignment (never from
    * raw tile counts, which would disagree with the rule on boundary
    * ties). Shares are Laplace-smoothed ((c + ½)/(n + bins/2)) so
    * empty buckets stay finite on both engines; per-bucket terms are
    * rounded then DECIMAL-summed.
    *
    * Shape: the cut points come from a DISTRIBUTED rank, never a
    * single-partition sort (a 100 TB reference slice cannot funnel
    * through one task): distinct-value counts (map-side combined) →
    * coarse range buckets from the broadcast (lo, hi) → per-bucket
    * totals with cumulative offsets (a window over the ≤256-row
    * bucket frame — bounded) → within-bucket running rank (window
    * PARTITIONED on the coarse bucket) → pick the values straddling
    * the bins−1 boundary ranks via a broadcast theta-join against the
    * (bins−1)-row rank grid. Cuts collapse to a broadcast 1-row
    * array; one scan of `df` then assigns buckets via flat codegen
    * comparisons, one (group, bucket)-keyed aggregate. Output:
    * (groupCol, n_rows, psi, drifted) per group, reference group
    * included (psi = 0). */
  /** Per-column data-quality profile in ONE aggregate pass: row count,
    * NULL count and fraction, NaN count (numeric columns only — listed
    * by the caller, isnan on non-numerics would not resolve), and the
    * EXACT distinct cardinality — the first report a pipeline runs
    * over a new snapshot (did a join key collapse, did a feed start
    * sending NULLs, is a "unique" id actually unique).
    *
    * Scale shape: one aggregate whose multi-column `countDistinct`
    * Catalyst plans as an Expand (input × profiled-column multiplier)
    * — the standard exact-profile plan, linear with a constant factor
    * of |cols|; the per-column output explode runs on the 1-row
    * totals. At 100 TB swap `countDistinct` for HLL sketches if ±2 %
    * is acceptable — exact is kept here because the oracle contract
    * is hash equality, and uniqueness AUDITS need exact anyway. */
  def missingnessProfile(df: DataFrame, numericCols: Set[String]): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"__null_$c"),
        (if (numericCols(c)) count(when(isnan(col(c)), 1)) else lit(0L))
          .as(s"__nan_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"__null_$c").as("n_null"),
          col(s"__nan_$c").as("n_nan"), col(s"__dist_$c").as("n_distinct"))): _*))
        .as("e"))
      .select(col("e.col_name").as("col_name"), col("__n").as("n_rows"),
        col("e.n_null").as("n_null"), col("e.n_nan").as("n_nan"),
        col("e.n_distinct").as("n_distinct"),
        round(col("e.n_null").cast("double") / col("__n"), 6).as("null_frac"))
  }

  /** EXACT per-group quantile values by rank — the [[psiDrift]]
    * distributed-rank construction generalized to grouped quantile
    * requests: for each group and each (name, q) in `qs`, the value at
    * rank ceil(q·n) of the group's `valueCol` order (the f10/oracle
    * rank convention; ties share a distinct-value row, so the selected
    * VALUE is tie-order-independent).
    *
    * No corpus-scaled sort anywhere: the distinct-value histogram is
    * one (group, value)-keyed aggregate; coarse range buckets give
    * each value a bucket whose offset is folded WINDOW-FREE by the
    * bounded sequence fan-out (≤256² rows per group); the only window
    * is the within-bucket running rank, PARTITIONED by (group, bucket)
    * — each sort is one bucket's distinct values, ~1/256 of a group.
    * The boundary rank k = ceil(q·n) is computed ROW-LOCALLY (n rides
    * on the bucketed frame; the qs are literals), so no rank-grid
    * broadcast job exists.
    * Exactness matters when the quantile IS the contract (winsorize
    * clips, SLA thresholds); use `percentile_approx` when ±ε is fine.
    *
    * Toy-scale cost adjudication (shared with [[psiDrift]], measured
    * r12 at sf0.1, 100 k rows, local[32]): one evaluation schedules 12
    * AQE query-stage jobs (t16's psiDrift: 24) at a ~0.1 s scheduling
    * floor each — that IS the warm wall-clock; the data work is
    * microseconds. Each job is one exchange the construction needs
    * (histogram shuffle, scalars/offs broadcasts, bucketed window,
    * persist materializations, final joins). Halving the job count
    * requires collapsing exchanges into global single-partition
    * windows — exactly the corpus-funnel the construction exists to
    * avoid; at cluster scale the same stages amortize over real data
    * work, so the fixed floor is accepted rather than traded.
    *
    * Output: (groupCol, qname, qvalue), one row per group × request. */
  def groupQuantilesByRank(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"quantile requests must lie in (0, 1], got $qs")
    val coarseB = 256
    val h = CacheScope.persist(df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c")))
    val scal = h.groupBy(groupCol)
      .agg(min("v").as("lo"), max("v").as("hi"), sum("c").as("n"))
    // n rides along on every bucketed row (8 bytes) so the boundary
    // rank k = ceil(q·n) is ROW-LOCAL below — computing it there
    // removes what used to be a separate rank-grid broadcast job +
    // theta join (the per-job floor dominates this operator, see the
    // stage accounting on [[psiDrift]])
    val bucketed = CacheScope.persist(h.join(broadcast(scal), groupCol)
      .withColumn("cb", when(col("hi") <= col("lo"), lit(0)).otherwise(
        least(floor((col("v") - col("lo")) / (col("hi") - col("lo"))
          * coarseB), lit(coarseB - 1))).cast("int"))
      .select(col(groupCol), col("v"), col("c"), col("cb"), col("n")))
    val offs = bucketed.groupBy(col(groupCol), col("cb")).agg(sum("c").as("bc"))
      .filter(col("cb") < coarseB - 1)
      .select(col(groupCol),
        explode(expr(s"sequence(cb + 1, ${coarseB - 1})")).as("cb"), col("bc"))
      .groupBy(col(groupCol), col("cb")).agg(sum("bc").as("off"))
    val ranked = bucketed.join(broadcast(offs), Seq(groupCol, "cb"), "left")
      .withColumn("off", coalesce(col("off"), lit(0L)))
      .withColumn("cum", col("off") + sum("c").over(
        Window.partitionBy(col(groupCol), col("cb")).orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
    // the qs are compile-time literals, so the request fan-out is a
    // row-local explode (≤|qs| rows per distinct value) instead of a
    // broadcast theta join — identical selected rows: rank uniqueness
    // per distinct value makes each (group, qname) match exactly once
    ranked.select(col(groupCol), col("v"), col("c"), col("cum"),
        explode(array(qs.map { case (nm, q) =>
          struct(lit(nm).as("qname"),
            ceil(lit(q) * col("n")).cast("long").as("k")) }: _*)).as("e"))
      .filter(col("cum") - col("c") < col("e.k") && col("e.k") <= col("cum"))
      .select(col(groupCol), col("e.qname").as("qname"), col("v").as("qvalue"))
  }

  /** Population-stability-index drift per group vs a reference slice —
    * exact ntile cuts via the distributed-rank construction (see
    * [[groupQuantilesByRank]]), then a second map-side-combined pass
    * assigns every row a bucket against the 1-row broadcast cut array
    * (shuffle = groups × bins, never corpus-sized) and the smoothed
    * shares fold to one PSI per group.
    *
    * Toy-scale cost adjudication (r10 task 4, measured r12 at sf0.1 =
    * 100 k rows, local[32]): a warm evaluation is ~2.6 s solo-bench =
    * 24 AQE query-stage jobs × ~0.1 s scheduling floor; per-stage data
    * work is microseconds. The r12 trims cut the two removable jobs —
    * the boundary ranks are row-local (n on the bucketed frame, no
    * ks broadcast/theta join) and the reference side folds to ONE
    * 1-row (rn, bucket→count map) broadcast instead of refC + refN —
    * worth ~8 % warm / 23 % cold; the remaining 24 stages are the
    * exchanges the two-pass exact-quantile shape inherently needs
    * (reference histogram, scalars/offs broadcasts, bucketed window,
    * cut fold, assignment scan, counts/totals/grid joins, final agg).
    * Going lower means single-partition global windows — the corpus
    * funnel this construction exists to avoid — so the fixed floor is
    * accepted: at cluster scale the same stages amortize over real
    * data work. */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
      refGroup: Column, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2 && bins <= 100, s"psiDrift needs 2 <= bins <= 100, got $bins")
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val coarseB = 256
    val ref = df.filter(refGroup).select(col(valueCol).as("v"))
    // persisted: scalars, the bucket assignment AND the rank-grid all
    // re-read this frame — unpersisted it would recompute the
    // reference scan three times
    val vCnts = CacheScope.persist(ref.groupBy("v").agg(count(lit(1)).as("c")))
    val scalars = vCnts.agg(min("v").as("lo"), max("v").as("hi"),
      sum("c").as("n"))
    // coarse bucket by value range — equal values always share a
    // bucket, so within-bucket rank + bucket offset is a global rank.
    // n rides along (8 bytes/row) so the ntile boundary ranks are
    // row-local below — one fewer broadcast job (see stage accounting
    // in the header)
    val bucketed = CacheScope.persist(vCnts.crossJoin(broadcast(scalars))
      .withColumn("cb", when(col("hi") <= col("lo"), lit(0)).otherwise(
        least(floor((col("v") - col("lo")) / (col("hi") - col("lo"))
          * coarseB), lit(coarseB - 1))).cast("int"))
      .select(col("v"), col("c"), col("cb"), col("n")))
    // bucket offsets WITHOUT any window: each bucket's total
    // contributes to every HIGHER bucket's offset (≤256² fan-out rows,
    // compile-time bounded), folded by an equi-groupBy — so no
    // WindowExec, partitioned or otherwise, touches this path
    val offs = bucketed.groupBy("cb").agg(sum("c").as("bc"))
      .filter(col("cb") < coarseB - 1) // sequence(a,b) DESCENDS if a > b
      .select(explode(expr(s"sequence(cb + 1, ${coarseB - 1})")).as("cb"),
        col("bc"))
      .groupBy("cb").agg(sum("bc").as("off"))
    val ranked = bucketed.join(broadcast(offs), Seq("cb"), "left")
      .withColumn("off", coalesce(col("off"), lit(0L)))
      .withColumn("cum", col("off") + sum("c").over(
        Window.partitionBy("cb").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
    // boundary ranks of the bins−1 interior ntile edges; tiles beyond
    // the row count (tiny reference) are empty in ntile and emit no
    // cut, so keep only t with a nonzero tile size. n is already on
    // every ranked row, so the edge fan-out is a row-local explode
    // (bins−1 rows per distinct value) + filter — identical selected
    // rows to the former broadcast theta join (ranks are unique per
    // distinct value, so each t matches exactly once), one fewer job
    val cuts = ranked
      .select(col("v"), col("c"), col("cum"), col("n"),
        explode(expr(s"sequence(1, ${bins - 1})")).as("t"))
      .filter((expr(s"n DIV $bins") > 0 || col("t") <= col("n") % bins) &&
        col("cum") - col("c") <
          (col("t") * expr(s"n DIV $bins") + least(col("t"), col("n") % bins)) &&
        (col("t") * expr(s"n DIV $bins") + least(col("t"), col("n") % bins))
          <= col("cum"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(t, v))), x -> x.v)")
        .as("cuts"))
    // bucket = 1 + #{cuts < v}, UNROLLED over the bins-1 cut positions:
    // a higher-order filter() runs interpreted per row (repo codegen
    // discipline); the flat comparison chain stays in whole-stage
    // codegen. Absent trailing cuts (tiny reference) compare NULL →
    // contribute 0, which matches the filter() semantics.
    val bucketExpr = "1" + (1 until bins).map(i =>
      s" + (CASE WHEN element_at(cuts, $i) < v THEN 1 ELSE 0 END)").mkString
    val assigned = df.select(col(groupCol), col(valueCol).as("v"))
      .crossJoin(broadcast(cuts))
      .select(col(groupCol), expr(bucketExpr).as("bucket"))
    val counts = CacheScope.persist(
      assigned.groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as("c")))
    val totals = counts.groupBy(col(groupCol)).agg(sum("c").as("n"))
    // the whole reference side folds to ONE 1-row broadcast (total rn
    // + bucket→count map, ≤bins entries) instead of two separate
    // broadcast jobs (refC per-bucket frame + refN scalar) — the
    // grouped agg keeps the empty-reference behavior (zero groups →
    // zero rows → empty crossJoin → empty output, same as before).
    // Counts are summed BY BUCKET before map_from_entries: a refGroup
    // predicate matching several groups repeats each bucket in the
    // collect_list, and duplicate map keys THROW at runtime under the
    // default spark.sql.mapKeyDedupPolicy=EXCEPTION — the pooled sum
    // makes a multi-group reference well-defined (and is a no-op for
    // the single-group predicates the registry uses)
    val refF = counts.filter(refGroup)
      .groupBy("bucket").agg(sum("c").as("c"))
      .groupBy(lit(true).as("__one"))
      .agg(sum("c").as("rn"),
        map_from_entries(collect_list(struct(col("bucket"), col("c"))))
          .as("rcm"))
      .select(col("rn"), col("rcm"))
    // fixed bucket frame per group: absent buckets still contribute via
    // the smoothed zero share
    val grid = totals.select(col(groupCol), col("n"))
      .crossJoin(broadcast(refF))
      .select(col(groupCol), col("n"), col("rn"), col("rcm"),
        explode(expr(s"sequence(1, $bins)")).as("bucket"))
    val rc = element_at(col("rcm"), col("bucket"))
    val terms = grid
      .join(counts, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), col("n"),
        round(((coalesce(col("c"), lit(0L)) + lit(0.5)) / (col("n") + lit(bins / 2.0))
            - (coalesce(rc, lit(0L)) + lit(0.5)) / (col("rn") + lit(bins / 2.0)))
          * log(((coalesce(col("c"), lit(0L)) + lit(0.5)) / (col("n") + lit(bins / 2.0)))
            / ((coalesce(rc, lit(0L)) + lit(0.5)) / (col("rn") + lit(bins / 2.0)))),
          6).as("term"))
    terms.groupBy(col(groupCol))
      .agg(max(col("n")).as("n_rows"),
        round(sum(col("term").cast(dec)).cast("double"), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
  }

  /** Embedding-space drift monitor — the [[psiDrift]] analog for a
    * VECTOR column ("is this source/snapshot embedded like the corpus
    * we trained the index on"): each group's centroid is compared to
    * the global centroid by cosine, plus the centroid-norm ratio
    * (cosine catches direction shift, the norm ratio catches
    * magnitude collapse — both move when a crawl snapshot's topic mix
    * or an embedding-model version drifts).
    *
    * Shape: one posexplode pass feeds two (key, dim)-keyed aggregates
    * (per-group and global — map-side combined; shuffle =
    * (groups + 1) · dim rows, never corpus-sized); centroids are
    * rebuilt as arrays on the group-count-bounded frame and the global
    * row broadcasts. Determinism: per-dimension sums ride
    * DECIMAL(28,12) ([[graft.functions.Deterministic.stableSum]] —
    * order-invariant, oracle-replayable); the cosine is the native
    * sequential fold (`graft_cosine`, dimension-ascending — the
    * unrolled-chain order every oracle replays). `drifted` compares
    * the ROUNDED cosine so both engines decide the flag on the same
    * value. Output: (groupCol, n_vecs, cos_to_global, norm_ratio,
    * drifted). */
  def embeddingDrift(vectors: DataFrame, groupCol: String, vecCol: String,
      dim: Int, minCos: Double = 0.99): DataFrame = {
    import graft.functions.Deterministic.stableSum
    val ex = CacheScope.persist(vectors
      .select(col(groupCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x"))))
    def centroid(keys: Seq[Column], out: DataFrame => DataFrame): DataFrame =
      out(ex.groupBy(keys :+ col("__i"): _*)
        .agg(stableSum(col("__x"), 12).as("__sx"), count(lit(1)).as("__n")))
    val byGroup = centroid(Seq(col(groupCol)), g =>
      g.groupBy(col(groupCol)).agg(max(col("__n")).as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(__i, __sx))), e -> e.__sx)")
          .as("__sums"))
        .select(col(groupCol), col("n_vecs"),
          expr("transform(__sums, s -> s / n_vecs)").as("__cg")))
    val global = centroid(Nil, g =>
      g.groupBy().agg(max(col("__n")).as("__gn"),
        expr("transform(array_sort(collect_list(struct(__i, __sx))), e -> e.__sx)")
          .as("__sums"))
        .select(expr("transform(__sums, s -> s / __gn)").as("__cglob")))
    val dotG = Similarity.dotExpr("__cg", "__cg", dim)
    val dotA = Similarity.dotExpr("__cglob", "__cglob", dim)
    byGroup.crossJoin(broadcast(global))
      .select(col(groupCol), col("n_vecs"),
        round(expr("graft_cosine(__cg, __cglob)"), 6).as("cos_to_global"),
        round(sqrt(expr(dotG)) / sqrt(expr(dotA)), 6).as("norm_ratio"))
      .withColumn("drifted", col("cos_to_global") < minCos)
  }
}
