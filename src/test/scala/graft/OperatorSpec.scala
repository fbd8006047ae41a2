package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin
import graft.functions.Deterministic

/** Operator-level specs: the bucketed range join against a naive
  * `between` reference plan, window-boundary edge cases, and the
  * partition-layout invariance of the deterministic sampling/summation
  * primitives (the property that makes results identical on 1 or 1000
  * executors).
  */
class OperatorSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import scala.jdk.CollectionConverters._

  test("AsOfJoin.latestPreceding: inclusive ties, left-join nulls, consistent payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (1L, 4L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100L, 1.5), (1L, 8L, 200L, 2.5), (2L, 9L, 300L, 3.5))
      .toDF("k", "rt", "rid", "rv")
    val out = graft.operators.AsOfJoin
      .latestPreceding(left, right, Seq("k"), "t", "rt", Seq("rid", "rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out == Set(
      (1L, 10L, "a", Some(200L), Some(2.5)), // latest preceding is t=8, not t=5
      (1L, 5L, "b", Some(100L), Some(1.5)),  // inclusive: rightTime == leftTime
      (1L, 4L, "c", None, None),             // nothing precedes → NULL payload
      (2L, 7L, "d", None, None)))            // right row exists only later
    // payload collision is a construction-time error
    intercept[IllegalArgumentException](graft.operators.AsOfJoin
      .latestPreceding(left.withColumnRenamed("tag", "rid"), right,
        Seq("k"), "t", "rt", Seq("rid", "rv")))
  }

  private def df(rows: Seq[(Long, Long)], c1: String, c2: String) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField(c1, LongType), StructField(c2, LongType)))
    spark.createDataFrame(
      rows.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava, schema)
  }

  test("RangeJoin.segment matches the naive between-join on seeded data") {
    val rnd = new scala.util.Random(42)
    val events = df((1L to 40L).map(i => (i % 5, rnd.nextInt(1000).toLong)), "k", "tau")
    val series = df((1L to 800L).map(i => (i % 5, rnd.nextInt(1000).toLong)), "k", "t")
    val (pre, post) = (37L, 90L)

    val got = RangeJoin.segment(events, series, Seq("k"), "tau", "t", pre, post)
      .select("k", "t", "tau", "rel_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val want = series.as("s").join(events.as("e"),
        col("s.k") === col("e.k") &&
          col("s.t") >= col("e.tau") - pre && col("s.t") <= col("e.tau") + post)
      .select(col("s.k"), col("s.t"), col("e.tau"), (col("s.t") - col("e.tau")).as("rel_off"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(got == want)
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, _, off) => off >= -pre && off <= post })
  }

  test("RangeJoin.segment window boundaries are inclusive on both edges") {
    val events = df(Seq((1L, 100L)), "k", "tau")
    val series = df(Seq((1L, 90L), (1L, 91L), (1L, 110L), (1L, 111L)), "k", "t")
    val got = RangeJoin.segment(events, series, Seq("k"), "tau", "t", 9L, 10L)
      .select("t").collect().map(_.getLong(0)).toSet
    assert(got == Set(91L, 110L))
  }

  test("RangeJoin.segment with zero-width window keeps only exact matches") {
    val events = df(Seq((1L, 5L), (2L, 7L)), "k", "tau")
    val series = df(Seq((1L, 5L), (1L, 6L), (2L, 7L), (2L, 8L)), "k", "t")
    val got = RangeJoin.segment(events, series, Seq("k"), "tau", "t", 0L, 0L)
      .select("k", "rel_off").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 0L)))
  }

  test("RangeJoin.segment without keys joins every event to the time range") {
    val events = df(Seq((0L, 10L)), "ignore", "tau").select("tau")
    val series = df((0L to 30L).map(t => (0L, t)), "ignore", "t").select("t")
    val n = RangeJoin.segment(events, series, Seq.empty, "tau", "t", 2L, 3L).count()
    assert(n == 6) // t in [8, 13]
  }

  test("hrand is invariant to partition layout") {
    import spark.implicits._
    val keys = (1L to 1000L).toDF("k")
    def sample(parts: Int): Set[Long] =
      keys.repartition(parts)
        .withColumn("h", Deterministic.hrand(col("k"), 12345L))
        .orderBy("h", "k").limit(50)
        .select("k").as[Long].collect().toSet
    assert(sample(1) == sample(7))
    assert(sample(7) == sample(32))
  }

  test("WilcoxonSignedRank aggregator: hand-computed cases with ties and zeros") {
    import graft.functions.WilcoxonSignedRank
    // no ties: |d| sorted [1,2,3,4], ranks 1..4, W+ = 1+3+4 = 8
    val a = WilcoxonSignedRank.finish(List(1.0, -2.0, 3.0, 4.0))
    assert(a.n_eff == 4 && a.w_plus == 8.0)
    assert(math.abs(a.z - (8.0 - 5.0) / math.sqrt(7.5)) < 1e-12)
    // ties averaged: |d| = [1,1,2,2,3] -> ranks [1.5,1.5,3.5,3.5,5]
    val b = WilcoxonSignedRank.finish(List(1.0, -1.0, 2.0, 2.0, -3.0))
    assert(b.n_eff == 5 && b.w_plus == 1.5 + 3.5 + 3.5)
    // zero diffs dropped at reduce, empty group is NaN-z
    val c = WilcoxonSignedRank.finish(
      List(0.0, 5.0).foldLeft(WilcoxonSignedRank.zero)(WilcoxonSignedRank.reduce))
    assert(c.n_eff == 1 && c.w_plus == 1.0)
    assert(WilcoxonSignedRank.finish(Nil).z.isNaN)
    // merge order cannot change the statistic (p_exact compared
    // NaN-aware: this group has tied |d|, so the exact leg is NaN on
    // both sides and case-class == would see NaN != NaN)
    val l = List(3.0, -1.0); val r = List(2.0, -2.0, 4.0)
    val m1 = WilcoxonSignedRank.finish(WilcoxonSignedRank.merge(l, r))
    val m2 = WilcoxonSignedRank.finish(WilcoxonSignedRank.merge(r, l))
    assert((m1.n_eff, m1.w_plus, m1.z) == (m2.n_eff, m2.w_plus, m2.z))
    assert(m1.p_exact.isNaN && m2.p_exact.isNaN)
  }

  test("stableSum is invariant to row order and partitioning") {
    import spark.implicits._
    val vals = (1 to 20000).map(i => 0.1 + i * 1e-4).toDF("v")
    def total(parts: Int, desc: Boolean): Double = {
      val ordered = if (desc) vals.orderBy(col("v").desc) else vals
      ordered.repartition(parts)
        .agg(Deterministic.stableSum(col("v")).as("s"))
        .as[Double].head()
    }
    val a = total(1, desc = false)
    val b = total(13, desc = true)
    assert(a == b) // bit-exact, not approximately equal
  }

  test("stableSumGuarded propagates NaN/Inf instead of dropping them") {
    import spark.implicits._
    def agg(vs: Seq[Double]): Double =
      vs.toDF("v").repartition(3)
        .agg(Deterministic.stableSumGuarded(col("v")).as("s"))
        .as[Double].head()
    // clean data: exact decimal sum
    assert(agg(Seq(0.25, 0.5, 0.125)) == 0.875)
    // poison: a decimal cast would null these and sum() would skip them —
    // the guard must surface NaN, never a plausible finite total
    assert(agg(Seq(1.0, Double.NaN, 2.0)).isNaN)
    assert(agg(Seq(1.0, Double.PositiveInfinity)).isNaN)
    assert(agg(Seq(1.0, 1e19)).isNaN) // exceeds DECIMAL(38,18) range
  }
}
