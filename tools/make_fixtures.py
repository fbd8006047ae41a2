#!/usr/bin/env python3
"""Regenerate the committed golden-fixture oracles for the dense
linear-algebra kernel queries (L6-L12, L15), which have no SQL oracle.

For each kernel query, copy the (deterministic, 6-dp-rounded) Verify
output parquet into fixtures/<name>/sf_<N>.parquet, stamped with a
scale_n column = the customer row count of the generating scale. The
oracle (Q.fixtureOracle) globs all scales and selects WHERE scale_n =
(SELECT count(*) FROM customer), so one SQL string is correct at every
test scale.

Usage: tools/make_fixtures.py <sf_dir> <verify_out_dir>
Run once per scale, ONLY from a Verify run whose SQL oracles all passed
(the out dir must contain oracle_sql.json — proof it came from
graft.Verify, not a hand-made directory). Fixtures are regression pins,
never hand-edited; independent math cross-check: tools/check_kernels.py.
"""
import sys, os, glob
import duckdb

KERNELS = [
    "l6_pca_cv", "l7_cca_cv", "l7_cca_cv_ref10", "l8_glm_stats",
    "l9_sensitivity_sweep",
    "l10_principal_angles", "l11_participation",
    "l12_variance_decomposition", "l15_rastermap_order",
    # SQL-oracled except p_exact, which rides the fixture contract
    "t1_pearson_corr",
    # logistic IRLS (matrix solve) — not SQL-expressible
    "curate_quality_classifier",
    # decile calibration of the IRLS scores — same non-SQL solve upstream
    "curate_classifier_calibration",
    # end-to-end entry-point composition (segment -> gates -> region CCA
    # -> rollup) — ends in a CCA solve, not SQL-expressible
    "pipeline_region_cca",
    # entry-point-C composition (GLM moments -> |beta| rank-slice ->
    # refit sweep -> concentration pivot) — per-subset OLS refits
    "pipeline_glm_sensitivity",
]

sf_dir, out_dir = sys.argv[1], sys.argv[2]
assert os.path.exists(os.path.join(out_dir, "oracle_sql.json")), (
    f"{out_dir} lacks oracle_sql.json — fixtures may only be stamped from "
    "a complete graft.Verify output directory")
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
con = duckdb.connect()
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{sf_dir}/customer.parquet')").fetchone()[0]
for name in KERNELS:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    assert files, f"no Verify output for {name} in {out_dir}"
    dst_dir = os.path.join(repo, "fixtures", name)
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, f"sf_{n}.parquet")
    con.execute(
        f"COPY (SELECT *, {n}::BIGINT AS scale_n FROM read_parquet('{files[0]}')) "
        f"TO '{dst}' (FORMAT PARQUET)")
    print(f"wrote {dst} ({con.execute(f'SELECT count(*) FROM read_parquet({dst!r})').fetchone()[0]} rows)")
