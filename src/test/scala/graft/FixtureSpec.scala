package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Q

/** Guard against the round-2 regression class: a fixture-gated oracle
  * wired in code while the fixture parquet was never generated or
  * committed — which only surfaced when the external driver ran. This
  * fails `sbt test` the moment a `Q.fixtureOracle` name has no
  * committed, non-empty `fixtures/<name>/` directory.
  */
class FixtureSpec extends AnyFunSuite {

  private val fixturePat = """read_parquet\('[^']*/fixtures/([^/']+)/\*\.parquet'""".r

  /** (query, fixture dir) pairs — resolved against THIS checkout
    * (user.dir), not the absolute path baked into the oracle SQL, so the
    * guard inspects the tree actually under test. */
  private def gated: Seq[(String, java.io.File)] =
    Q.registry.flatMap(q =>
      q.oracle.toSeq.flatMap(o => fixturePat.findAllMatchIn(o).map(m =>
        q.name -> new java.io.File(sys.props("user.dir"), s"fixtures/${m.group(1)}"))))

  test("every fixture-gated oracle has a committed, non-empty fixture directory") {
    val g = gated
    assert(g.nonEmpty, "no fixture-gated queries found — oracle pattern drift?")
    g.foreach { case (qn, dir) =>
      val files = Option(dir.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty,
        s"query $qn reads fixture dir $dir which is missing or empty — " +
          "regenerate from a verified run (tools/make_fixtures.py) and commit")
    }
  }

  test("the fixture-gated set is exactly the declared kernel queries") {
    val expected = Set("l6_pca_cv", "l7_cca_cv", "l7_cca_cv_ref10", "l8_glm_stats",
      "l9_sensitivity_sweep", "l10_principal_angles", "l11_participation",
      "l12_variance_decomposition", "l15_rastermap_order",
      // t1 is SQL-oracled except its exact-t p column, which rides the
      // same committed-fixture contract
      "t1_pearson_corr",
      // logistic IRLS needs a matrix solve — not SQL-expressible
      "curate_quality_classifier",
      // decile calibration of the same IRLS scores — same solve upstream
      "curate_classifier_calibration",
      // the end-to-end entry-point compositions end in dense solves
      // (CCA / per-subset OLS refits respectively)
      "pipeline_region_cca", "pipeline_glm_sensitivity")
    assert(gated.map(_._1).toSet == expected)
  }

  test("fixtures carry a stamp for every committed test scale") {
    gated.foreach { case (qn, dir) =>
      val stamps = Option(dir.listFiles).getOrElse(Array.empty)
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
      // customer row counts of sf0.001 / sf0.01 / sf0.1
      Seq("sf_150.parquet", "sf_1500.parquet", "sf_15000.parquet").foreach(s =>
        assert(stamps.contains(s), s"$qn fixture lacks $s — run make_fixtures.py at that scale"))
    }
  }
}
