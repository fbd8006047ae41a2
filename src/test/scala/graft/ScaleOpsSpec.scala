package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Funnels, Incremental, Layout, Packing, Sampling, Sessionize, Sketches}

/** Unit coverage for the scale-infrastructure operators (QScale
  * registry family): sessionization boundaries, count-min guarantees,
  * Morton-key bit layout, incremental-merge == recompute.
  */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("Sessionize.label splits on gap, keeps ties together, is 0-based per key") {
    import spark.implicits._
    val e = Seq(
      (1L, 1000L), (1L, 1000L), (1L, 2000L),  // ties + in-gap step
      (1L, 4001L),                            // 2001s silence -> new session
      (2L, 50L)                               // second key restarts at 0
    ).toDF("k", "t")
    val out = Sessionize.label(e, "k", "t", gapSeconds = 2000L)
      .select("k", "t", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1000L, 0L), (1L, 2000L, 0L), (1L, 4001L, 1L), (2L, 50L, 0L)))
  }

  test("Sessionize.summarize aggregates per session") {
    import spark.implicits._
    val e = Seq((1L, 10L, 2.0), (1L, 20L, 3.0), (1L, 5000L, 5.0)).toDF("k", "t", "v")
    val rows = Sessionize.summarize(e, "k", "t", 1800L,
        Seq(sum("v").as("sv"))).orderBy("session_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("session_start") == 10L)
    assert(rows(0).getAs[Long]("session_end") == 20L)
    assert(rows(0).getAs[Long]("n_events") == 2L)
    assert(rows(0).getAs[Double]("sv") == 5.0)
  }

  test("Sketches.countMin never under-estimates and is exact at ample width") {
    import spark.implicits._
    val items = (1 to 200).map(i => s"k${i % 13}").toDF("key")
    val exact = items.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (width <- Seq(4, 1024)) {
      val cms = Sketches.countMin(items, "key", depth = 4, width = width)
      val probes = items.distinct()
      val est = Sketches.estimate(cms, probes, "key", 4, width).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"width=$width under-estimated $k")
      }
      if (width == 1024) assert(est == exact) // no collisions at 13 keys / 1024 buckets
    }
    // a never-seen probe key estimates 0 (empty cells count as zero)
    val unseen = Seq.tabulate(1)(_ => "never-seen").toDF("key")
    val cms = Sketches.countMin(items, "key", depth = 4, width = 1024)
    val e0 = Sketches.estimate(cms, unseen, "key", 4, 1024).collect()(0)
    assert(e0.getAs[Long]("n_est") == 0L)
  }

  test("Sketches.bloomPrune keeps every true match and only collision extras") {
    import spark.implicits._
    val members = Set(5L, 17L, 99L)
    val keys = members.toSeq.toDF("bk")
    val facts = (0L until 200L).toDF("k")
    val m = 64L
    val bits = Sketches.bloomBits(keys, "bk", m, numHashes = 3)
    val kept = Sketches.bloomPrune(facts, "k", bits, m, numHashes = 3)
      .collect().map(_.getLong(0)).toSet
    assert(members.subsetOf(kept), "bloom filter produced a false negative")
    // the kept set is exactly the all-positions-present definition
    val bitSet = bits.collect().map(_.getLong(0)).toSet
    def pos(k: Long, r: Int) =
      (k % Dedup.mixM * Dedup.mixA(r) + Dedup.mixB(r)) % Dedup.mixM % m
    val expected = (0L until 200L)
      .filter(k => (0 until 3).forall(r => bitSet(pos(k, r)))).toSet
    assert(kept == expected)
    assert(kept.size < 200, "64-bit array should still prune most non-members")
    // at ample width the filter is exact on this corpus (deterministic)
    val wide = 1L << 20
    val wideBits = Sketches.bloomBits(keys, "bk", wide, numHashes = 3)
    val keptWide = Sketches.bloomPrune(facts, "k", wideBits, wide, numHashes = 3)
      .collect().map(_.getLong(0)).toSet
    assert(keptWide == members)
  }

  test("Layout.zorder2 interleaves bits (x=3,y=5 -> 39) and SQL form agrees") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (7L, 7L), (255L, 0L)).toDF("x", "y")
    val got = df.select(Layout.zorder2(col("x"), col("y"), 8).as("z"),
        expr(Layout.zorder2Sql("x", "y", 8).replace("//", "div")).as("zsql"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(p => p._1 == p._2))
    assert(got(0)._1 == 39L)   // x=011 y=101 -> 100111
    assert(got(1)._1 == 0L)
    assert(got(2)._1 == 63L)   // full low 6 bits
    assert(got(3)._1 == 0x5555L) // x bits land on even positions
  }

  test("Layout.zorderBoxes chunks tile the keyspace with bounded boxes") {
    import spark.implicits._
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val boxes = Layout.zorderBoxes(pts.toDF("x", "y"), col("x"), col("y"),
        bits = 6, chunks = 4).collect()
    assert(boxes.length == 4)
    assert(boxes.map(_.getAs[Long]("n")).sum == 64L * 64L)
    // 4 chunks of a 6-bit Morton square are exactly its 32x32 quadrants
    boxes.foreach { b =>
      assert(b.getAs[Long]("x_max") - b.getAs[Long]("x_min") == 31L)
      assert(b.getAs[Long]("y_max") - b.getAs[Long]("y_min") == 31L)
    }
  }

  test("Incremental.mergeAggregates == direct recompute, incl. one-sided keys") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (3L, 9L), (4L, 1L))
      .toDF("k", "v")
    def partials(f: org.apache.spark.sql.DataFrame) =
      f.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    // split leaves k=2 snapshot-only and k=4 delta-only
    val merged = Incremental.mergeAggregates(
      partials(rows.filter(col("v") % 2 === 0)),
      partials(rows.filter(col("v") % 2 === 1)),
      Seq("k"))
    val direct = partials(rows)
    assert(merged.orderBy("k").collect().toSeq ==
      direct.orderBy("k").collect().toSeq)
  }

  test("Diagnostics.keySkew reports uniform vs skewed keyspaces") {
    import spark.implicits._
    val uniform = (1 to 100).map(i => i % 10).toDF("k")
    val skewed = ((1 to 91).map(_ => 0) ++ (1 to 9)).toDF("k")
    val u = operators.Diagnostics.keySkew(uniform, "k", "u").collect()(0)
    assert(u.getAs[Long]("n_keys") == 10L && u.getAs[Double]("skew_ratio") == 1.0)
    val s = operators.Diagnostics.keySkew(skewed, "k", "s").collect()(0)
    assert(s.getAs[Long]("max_cnt") == 91L)
    assert(s.getAs[Double]("top_share") == 0.91)
    assert(s.getAs[Double]("skew_ratio") == 9.1) // 91 / (100/10 keys)
  }

  test("TextOps.oovRate counts tokens outside the top-V vocab") {
    import spark.implicits._
    // corpus: 'a' x4, 'b' x2, 'c' x1 -> top-2 vocab = {a, b}; c is OOV
    val d = Seq(("g", "a a b c"), ("g", "a a b")).toDF("grp", "body")
    val r = operators.TextOps.oovRate(d, "grp", "body", vocabSize = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("n_oov") == 1L)
    assert(r.getAs[Double]("oov_rate") == math.rint(1.0 / 7 * 1e6) / 1e6)
    // full-size vocab -> zero OOV
    val full = operators.TextOps.oovRate(d, "grp", "body", vocabSize = 3)
      .collect()(0)
    assert(full.getAs[Long]("n_oov") == 0L)
  }

  test("TextOps.normalize canonicalizes case and whitespace") {
    import spark.implicits._
    val d = Seq("  Hello   WORLD ", "already clean", "tabs\t\tand\nnewlines")
      .toDF("text")
    val out = operators.TextOps.normalize(d, "text")
      .select("norm_text").collect().map(_.getString(0)).toSet
    assert(out == Set("hello world", "already clean", "tabs and newlines"))
  }

  test("Incremental.mergeAggregates rejects schema mismatch") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("k", "n")
    val b = Seq((1L, 2L)).toDF("k", "m")
    assertThrows[IllegalArgumentException] {
      Incremental.mergeAggregates(a, b, Seq("k"))
    }
  }

  test("Incremental.snapshotDiff classifies added/changed/unchanged") {
    import spark.implicits._
    // key 1: both halves (changed); key 2: old only (unchanged);
    // key 3: new only (added)
    val rows = Seq((1L, 10L), (1L, 90L), (2L, 20L), (3L, 95L)).toDF("k", "t")
    val got = Incremental.snapshotDiff(rows, Seq("k"), col("t") <= 50L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged", 3L -> "added"))
  }

  test("Diagnostics.categoryEntropy: uniform mix hits ln(k), single category 0") {
    import spark.implicits._
    val d = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c"))
      .map(("g1", _)) ++ Seq.fill(5)(("g2", "only"))
    val out = operators.Diagnostics.categoryEntropy(d.toDF("g", "c"), "g", "c")
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("entropy"), r.getAs[Double]("eff_cats"))).toMap
    assert(math.abs(out("g1")._1 - math.log(3)) < 1e-5)
    assert(math.abs(out("g1")._2 - 3.0) < 1e-4)
    assert(out("g2") == ((0.0, 1.0)))
  }

  test("Packing.slidingChunks covers every token; trailing chunk short") {
    import spark.implicits._
    val d = Seq((1L, 100L), (2L, 1L), (3L, 64L)).toDF("id", "nt")
    val out = Packing.slidingChunks(d, col("nt"), size = 64, stride = 48)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len")))
    // doc 1 (100 tok): starts 0/48 — the 48-window reaches the end
    // (covers 48..99), so no third start is emitted
    assert(out.filter(_._1 == 1L).sortBy(_._2).toSeq ==
      Seq((1L, 0, 0L, 64L), (1L, 1, 48L, 52L)))
    // every token covered: last chunk's start+len == n_tok
    assert(out.filter(_._1 == 1L).map(c => c._3 + c._4).max == 100L)
    // 1-token doc: one 1-token chunk; exact-size doc: one full chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0L, 1L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 0L, 64L)))
  }

  test("Sampling.prioritySample: k rows per stratum; exact when sample = stratum") {
    import spark.implicits._
    val d = (1L to 20L).map(i => ("big", i, i % 7 + 1)) ++
      Seq(("tiny", 100L, 5L), ("tiny", 101L, 7L))
    val out = Sampling.prioritySample(d.toDF("g", "key", "w"),
      "g", "key", "w", k = 4, seed = 7L)
    val big = out.filter(col("g") === "big").orderBy("rk").collect()
    assert(big.length == 4 && big.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(big(0).getAs[Double]("tau") > 0.0) // threshold live when stratum > k
    // priorities ranked descending
    val pri = big.map(_.getAs[Double]("priority"))
    assert(pri.zip(pri.tail).forall { case (a, b) => a >= b })
    // a stratum smaller than k is sampled whole: tau = 0 and the
    // subset-sum estimator degenerates to the EXACT total weight
    val tiny = out.filter(col("g") === "tiny").collect()
    assert(tiny.length == 2)
    assert(tiny.forall(_.getAs[Double]("tau") == 0.0))
    assert(tiny.forall(r => r.getAs[Double]("est_total") ==
      r.getAs[Long]("total_weight").toDouble))
  }

  test("Sketches.joinSizeEstimate never under-estimates; exact at ample width") {
    import spark.implicits._
    val a = (1 to 300).map(i => i.toLong % 17L).toDF("k")
    val b = (1 to 200).map(i => i.toLong % 11L).toDF("j")
    val exact = a.join(b, a("k") === b("j")).count()
    for (width <- Seq(8, 64, 1024)) {
      val est = Sketches.joinSizeEstimate(
        Sketches.countMinInt(a, "k", 4, width),
        Sketches.countMinInt(b, "j", 4, width), 4)
        .collect()(0).getAs[Long]("n_est")
      assert(est >= exact, s"width=$width under-estimated the join size")
      if (width == 1024) assert(est == exact, "ample width should be exact")
    }
  }

  test("Funnels.funnelTimes enforces order and the conversion window") {
    import spark.implicits._
    val e = Seq(
      // u1: clean view(10) -> click(20) -> purchase(25)
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 25L),
      // u2: purchase BEFORE the first view never converts; click after does
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 30L),
      // u3: click outside the window (10 + 100 < 200)
      (3L, "view", 10L), (3L, "click", 200L),
      // u4: no view at all -> not in the funnel
      (4L, "click", 10L), (4L, "purchase", 20L)
    ).toDF("u", "et", "t")
    val out = Funnels.funnelTimes(e, "u", "et", "t",
        Seq("view", "click", "purchase"), windowSeconds = Some(100L))
      .collect().map(r => r.getAs[Long]("u") ->
        (Option(r.get(r.fieldIndex("t_1"))), Option(r.get(r.fieldIndex("t_2")))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((Some(20L), Some(25L))))
    assert(out(2L) == ((Some(30L), None))) // pre-view purchase ignored
    assert(out(3L) == ((None, None)))      // out-of-window click
    val rep = Funnels.funnelReport(e, "u", "et", "t",
        Seq("view", "click", "purchase"), Some(100L))
      .orderBy("stage_idx").collect()
    assert(rep.map(_.getAs[Long]("n_users")).toSeq == Seq(3L, 2L, 1L))
    assert(rep(1).getAs[Double]("conv_from_prev") == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(rep(2).getAs[Double]("mean_seconds_from_prev") == 5.0)
  }

  test("Funnels.retentionCohorts builds the triangular matrix") {
    import spark.implicits._
    // buckets of 10: u1 cohort 0 active at 0,1,2; u2 cohort 0 active at
    // 0,2; u3 cohort 1 active at 1
    val e = Seq((1L, 5L), (1L, 15L), (1L, 25L), (2L, 9L), (2L, 29L), (3L, 12L))
      .toDF("u", "t")
    val out = Funnels.retentionCohorts(e, "u", "t", bucketSeconds = 10L)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_users"),
          r.getAs[Double]("retention"))).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)))
    assert(out((0L, 2L)) == ((2L, 2L, 1.0)))
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(out.size == 4)
  }

  test("Sketches.hyperLogLog estimates within the m-register error band") {
    import spark.implicits._
    // one group with 5000 distinct keys, one with 8 (linear-counting
    // range); duplicates must not move either estimate
    val d = ((1L to 5000L).map(("big", _)) ++ (1L to 5000L).map(("big", _)) ++
      (101L to 108L).map(("small", _))).toDF("g", "k")
    val est = Sketches.hyperLogLog(d, "g", "k", b = 6)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("hll_est")).toMap
    // 1.04/sqrt(64) ~ 13% standard error; assert a generous 3-sigma band
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.4,
      s"big-group estimate off: ${est("big")}")
    // small cardinality rides linear counting: near-exact
    assert(math.abs(est("small") - 8.0) <= 2.0, s"small: ${est("small")}")
  }

  test("Graphs.pageRank conserves mass and ranks the hub highest") {
    import spark.implicits._
    // star: center 0 connected to 1..4, symmetrized
    val raw = (1L to 4L).map(i => (0L, i))
    val edges = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    val r = operators.Graphs.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Double]("r")).toMap
    assert(r.size == 5)
    // total rank mass stays ~1 (no dangling nodes, rounding at 12dp)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // the hub holds the most rank; leaves are symmetric-identical
    assert(r(0L) > r(1L))
    assert((1L to 4L).map(r).distinct.size == 1)
    // closed form at d=0.85 (teleport 0.03): hub alternates
    // 0.2 -> 0.71 -> 0.2765 -> 0.644975 over the 3 unrolled iterations
    assert(math.abs(r(0L) - 0.644975) < 1e-9)
  }

  test("scale operators return empty (not crash) on empty input") {
    import spark.implicits._
    val noEvents = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    val noKeys = Seq.empty[(String, Long)].toDF("key", "x")
    assert(Sessionize.label(noEvents, "k", "t", 1800L).count() == 0)
    assert(Sessionize.summarize(noEvents, "k", "t", 1800L).count() == 0)
    assert(Sketches.countMin(noKeys, "key", 4, 16).count() == 0)
    assert(Sketches.estimate(
      Sketches.countMin(noKeys, "key", 4, 16), noKeys, "key", 4, 16).count() == 0)
    assert(Layout.zorderBoxes(noEvents.selectExpr("k AS x", "t AS y"),
      col("x"), col("y"), 8, 16).count() == 0)
    assert(Incremental.mergeAggregates(
      noKeys.groupBy("key").agg(count(lit(1)).as("n")),
      noKeys.groupBy("key").agg(count(lit(1)).as("n")),
      Seq("key")).count() == 0)
    // keySkew on an empty frame: one row of zero counts with NULL-free
    // label, not a crash (n_rows 0 makes the ratios NULL — acceptable
    // for a diagnostic, asserted so the contract is pinned)
    val diag = operators.Diagnostics.keySkew(noKeys, "key", "empty").collect()
    assert(diag.length == 1 && diag(0).getAs[Long]("n_keys") == 0L)
    assert(Packing.slidingChunks(
      noEvents.selectExpr("k AS id", "t AS nt"), col("nt"), 64, 48).count() == 0)
    assert(Sampling.prioritySample(
      noEvents.selectExpr("k AS g", "t AS key", "v AS w"),
      "g", "key", "w", k = 3, seed = 1L).count() == 0)
    // empty-side join estimate: one row, n_est = 0
    val js = Sketches.joinSizeEstimate(
      Sketches.countMinInt(noKeys.select(col("x")), "x", 4, 16),
      Sketches.countMinInt(noKeys.select(col("x")), "x", 4, 16), 4).collect()
    assert(js.length == 1 && js(0).getAs[Long]("n_est") == 0L)
    val noTyped = Seq.empty[(Long, String, Long)].toDF("u", "et", "t")
    assert(Funnels.funnelTimes(noTyped, "u", "et", "t",
      Seq("view", "click")).count() == 0)
    assert(Funnels.retentionCohorts(
      noTyped.select(col("u"), col("t")), "u", "t", 10L).count() == 0)
  }

  test("graph_pagerank_directed's fixture really exercises the dangling branch") {
    // the query exists to run pageRank's dangling-mass slow path
    // end-to-end; if the fixture ever stopped containing out-degree-0
    // nodes, the oracle would still agree (both engines on the fast
    // path) and the branch would be silently untested again — so the
    // dangling count is pinned here, not just reported
    import graft.queries.Q
    val rows = Q.registry.find(_.name == "graph_pagerank_directed").get
      .build(spark, s"${Q.testdataRoot}/sf0.001")
      .collect()
    assert(rows.nonEmpty, "directed pagerank must produce rows")
    val nDangling = rows.head.getAs[Long]("n_dangling")
    assert(nDangling > 0L,
      s"the directed graph must contain out-degree-0 nodes, got $nDangling")
    assert(rows.forall(_.getAs[String]("entity") == "supplier"),
      "suppliers (the dangling side) receive all inbound mass and must top the rank")
  }
}
