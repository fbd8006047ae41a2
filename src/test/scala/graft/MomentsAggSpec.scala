package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MomentsAgg

/** Contract tests for the sufficient-statistics aggregate that powers
  * the dense-kernel layer (QKernels.labelMoments): exactness vs a
  * sequential BigDecimal reference, bit-identity under any partition
  * layout (the exact-decimal order-invariance claim), and the
  * poison-row flood semantics for NaN/overflow inputs.
  */
class MomentsAggSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private val dims = 3

  private def runAgg(rows: Seq[(Int, Seq[Double])], partitions: Int) = {
    import spark.implicits._
    val magg = udaf(new MomentsAgg(dims),
      implicitly[org.apache.spark.sql.Encoder[Seq[Double]]])
    rows.toDF("g", "v").repartition(partitions)
      .groupBy("g").agg(magg(col("v")).as("mm"))
      .select(col("g"), col("mm.n"), col("mm.bad"), col("mm.s"), col("mm.m"))
      .as[(Int, Long, Long, Seq[Double], Seq[Double])]
      .collect().sortBy(_._1).toSeq
  }

  test("moments match a sequential exact-decimal reference") {
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(200)((rnd.nextInt(2), Seq.fill(dims)(rnd.nextDouble() * 20 - 10)))
    val got = runAgg(rows, 4)
    for ((g, n, bad, s, m) <- got) {
      val vs = rows.filter(_._1 == g).map(_._2)
      assert(n == vs.size && bad == 0)
      for (i <- 0 until dims) {
        val want = vs.map(v => new java.math.BigDecimal(v(i)))
          .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
        assert(s(i) == want, s"first-order sum g=$g i=$i")
      }
      var idx = 0
      for (i <- 0 until dims; j <- i until dims) {
        val want = vs.map(v => new java.math.BigDecimal(v(i) * v(j)))
          .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
        assert(m(idx) == want, s"second-order sum g=$g ($i,$j)")
        idx += 1
      }
    }
  }

  test("bit-identical across partition layouts and row orders") {
    val rnd = new scala.util.Random(11L)
    val rows = Seq.fill(500)((rnd.nextInt(3), Seq.fill(dims)(rnd.nextGaussian() * 1e3)))
    val base = runAgg(rows, 1)
    for (p <- Seq(2, 7, 32)) {
      assert(runAgg(rnd.shuffle(rows), p) == base, s"layout p=$p diverged")
    }
  }

  test("a NaN / overflow row floods the group's moments and counts as bad") {
    val clean = Seq((0, Seq(1.0, 2.0, 3.0)), (0, Seq(4.0, 5.0, 6.0)))
    val poisoned = clean ++ Seq(
      (1, Seq(1.0, Double.NaN, 2.0)),
      (1, Seq(2.0, 3.0, 4.0)),
      (2, Seq(1e10, 1.0, 1.0)), // |x| ≥ 1e9 decimal-guard bound
      (2, Seq(0.5, 0.5, 0.5)))
    val got = runAgg(poisoned, 3)
    val byG = got.map(r => r._1 -> r).toMap
    assert(byG(0)._2 == 2 && byG(0)._3 == 0 && !byG(0)._4.exists(_.isNaN))
    for (g <- Seq(1, 2)) {
      assert(byG(g)._2 == 2 && byG(g)._3 == 1, s"group $g counts")
      assert(byG(g)._4.forall(_.isNaN) && byG(g)._5.forall(_.isNaN), s"group $g flood")
    }
  }
}
