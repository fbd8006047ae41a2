#!/usr/bin/env python3
"""Independent cross-check of the dense linear-algebra kernel queries.

The committed fixtures (tools/make_fixtures.py) are regression pins --
copies of the engine's own Verify output. This tool is the independence
leg: it recomputes every kernel query (l6-l12, l15) from the raw parquet
in pure numpy (PCA/CCA/OLS/principal angles re-implemented from the
textbook formulations, t-distribution via the incomplete-beta continued
fraction) and compares against the Verify output within 2e-6 (outputs
are 6-dp rounded; the two implementations agree to ~1e-9 before
rounding, so only exact .5-boundary ties could exceed 1e-6).

Usage: tools/check_kernels.py <sf_dir> <verify_out_dir>
Exit 0 = all kernels match. Run once per scale BEFORE stamping fixtures.
"""
import sys, math, glob
import numpy as np
import duckdb

TOL = 2e-6
sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()


def load(name):
    f = glob.glob(f"{out_dir}/{name}/*.parquet")
    assert f, f"no Verify output for {name}"
    return con.execute(f"SELECT * FROM read_parquet('{f[0]}')").df()


# ---------------------------------------------------------------- kernels
def sign_fix(w):
    """Entry with max |value| per column made positive (matches LinAlg)."""
    flips = np.ones(w.shape[1])
    for j in range(w.shape[1]):
        i = np.argmax(np.abs(w[:, j]))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
            flips[j] = -1.0
    return flips


def pca(x, k):
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / (x.shape[0] - 1)
    ev, vec = np.linalg.eigh(cov)           # ascending
    order = np.arange(len(ev))[::-1][:k]    # descending, top k
    lam = np.maximum(ev[order], 0.0)
    w = vec[:, order].copy()
    sign_fix(w)
    total = np.maximum(ev, 0.0).sum() or 1.0
    expl = lam / total
    return w, lam, expl, np.cumsum(expl)


def pca_cv_err(x, k, folds):
    n = x.shape[0]
    errs = np.zeros(folds)
    for f in range(folds):
        lo, hi = f * n // folds, (f + 1) * n // folds
        tr = np.r_[0:lo, hi:n]
        te = np.r_[lo:hi]
        if len(te) and len(tr) > 1:
            mu = x[tr].mean(axis=0)
            w, *_ = pca(x[tr], k)
            xte = x[te] - mu
            diff = xte - xte @ (w @ w.T)
            errs[f] = (diff ** 2).sum() / diff.size
    return errs


def cca(x, y, k):
    """Bjorck-Golub QR+SVD with the same ridge-escalation contract."""
    n = x.shape[0]
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)

    def attempt(lam):
        if lam == 0.0:
            xa, ya = xc, yc
        else:
            rl = math.sqrt(lam)
            px, py = xc.shape[1], yc.shape[1]
            xa = np.vstack([xc, rl * np.eye(px), np.zeros((py, px))])
            ya = np.vstack([yc, np.zeros((px, py)), rl * np.eye(py)])
        qx, rx = np.linalg.qr(xa)
        qy, ry = np.linalg.qr(ya)
        dx, dy = np.abs(np.diag(rx)), np.abs(np.diag(ry))
        if dx.min() <= dx.max() * xa.shape[0] * 2.2e-16:
            return None
        if dy.min() <= dy.max() * ya.shape[0] * 2.2e-16:
            return None
        u, s, vt = np.linalg.svd(qx.T @ qy)
        kk = min(k, x.shape[1], y.shape[1])
        scale = math.sqrt(n - 1)
        a = np.linalg.solve(rx, u[:, :kk]) * scale
        b = np.linalg.solve(ry, vt.T[:, :kk]) * scale
        flips = sign_fix(a)
        b *= flips
        r = np.clip(s[:kk], 0.0, 1.0)
        return a, b, r, lam

    lam, out, tries = 0.0, attempt(0.0), 0
    while out is None and tries < 5:
        lam = 1e-6 if lam == 0.0 else lam * 10
        out = attempt(lam)
        tries += 1
    assert out is not None, "CCA ridge escalation exhausted"
    return out


def pearson(a, b):
    da, db = a - a.mean(), b - b.mean()
    saa, sbb = (da ** 2).sum(), (db ** 2).sum()
    return 0.0 if saa <= 0 or sbb <= 0 else (da * db).sum() / math.sqrt(saa * sbb)


def cca_cv(x, y, k, folds):
    n = x.shape[0]
    res = np.zeros((folds, k))
    for f in range(folds):
        lo, hi = f * n // folds, (f + 1) * n // folds
        te, tr = np.r_[lo:hi], np.r_[0:lo, hi:n]
        if len(te) > 2 and len(tr) > max(x.shape[1], y.shape[1]) + 1:
            a, b, r, _ = cca(x[tr], y[tr], k)
            u, v = x[te] @ a, y[te] @ b
            for c in range(min(k, len(r))):
                res[f, c] = pearson(u[:, c], v[:, c])
    return res


def betacf(a, b, x):
    """Continued fraction for the incomplete beta (Lentz; public-domain
    textbook algorithm)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < 1e-30:
        d = 1e-30
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30: d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30: c = 1e-30
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30: d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30: c = 1e-30
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-16:
            break
    return h


def betai(a, b, x):
    if x <= 0.0: return 0.0
    if x >= 1.0: return 1.0
    ln_bt = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
             + a * math.log(x) + b * math.log(1.0 - x))
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * betacf(a, b, x) / a
    return 1.0 - bt * betacf(b, a, 1.0 - x) / b


def t_two_sided_p(t, dof):
    if math.isnan(t): return float("nan")
    return betai(dof / 2.0, 0.5, dof / (dof + t * t))


def t_inv(prob, dof):
    lo, hi = 0.0, 1e3
    for _ in range(200):
        mid = (lo + hi) / 2
        if 1.0 - t_two_sided_p(mid, dof) / 2.0 < prob:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def ols(x, y):
    n, p = x.shape[0], x.shape[1] + 1
    xd = np.hstack([np.ones((n, 1)), x])
    xtx_inv = np.linalg.inv(xd.T @ xd)
    beta = xtx_inv @ (xd.T @ y)
    resid = y - xd @ beta
    rss = (resid ** 2).sum()
    tss = ((y - y.mean()) ** 2).sum()
    dof = n - p
    sigma2 = rss / dof
    se = np.sqrt(np.maximum(np.diag(xtx_inv), 0.0) * sigma2)
    t = np.where(se > 0, beta / se, np.nan)
    pv = np.array([t_two_sided_p(tv, dof) for tv in t])
    tc = t_inv(0.975, dof)
    r2 = 1.0 - rss / tss if tss > 0 else 0.0
    adj = 1.0 - (1.0 - r2) * (n - 1) / dof
    ll = -0.5 * n * (math.log(2 * math.pi * rss / n) + 1.0)
    aic = -2 * ll + 2.0 * (p + 1)
    bic = -2 * ll + math.log(n) * (p + 1)
    return beta, se, t, pv, beta - tc * se, beta + tc * se, r2, adj, aic, bic, dof


def principal_angles(a, b):
    qa = np.linalg.qr(a)[0]
    qb = np.linalg.qr(b)[0]
    s = np.linalg.svd(qa.T @ qb, compute_uv=False)
    return np.degrees(np.arccos(np.clip(s, -1.0, 1.0)))


def hrand(key, seed):
    k = ((key % 2147483648) + 2147483648) % 2147483648
    return (((k * 1103515245 + seed * 12345 + 104729) % 2147483648)
            + 2147483648) % 2147483648


# ------------------------------------------------------------------ data
emb = con.execute(
    f"SELECT label, vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
    "ORDER BY label, vec_id").fetchall()
groups = {}
for label, vec_id, e in emb:
    groups.setdefault(label, []).append(np.asarray(e, dtype=np.float32).astype(np.float64))
groups = {lb: np.vstack(v) for lb, v in sorted(groups.items())}

failures = []


def check(name, expected_rows, got_df, cols):
    """expected_rows: list of tuples keyed like got_df's leading columns."""
    exp = np.array([[r[c] for c in cols] for r in expected_rows], dtype=np.float64)
    got = got_df[cols].to_numpy(dtype=np.float64)
    if exp.shape != got.shape:
        failures.append(f"{name}: shape {got.shape} != expected {exp.shape}")
        return
    with np.errstate(invalid="ignore"):
        both_nan = np.isnan(exp) & np.isnan(got)
        diff = np.abs(exp - got)
        diff[both_nan] = 0.0
    # np.max, NOT nanmax: a one-sided NaN (engine NaN vs finite numpy, or
    # vice versa) must propagate and FAIL, not be skipped
    mx = np.max(diff) if diff.size else 0.0
    # NOT `mx > TOL`: a NaN max (one-sided NaN) fails both comparisons
    # and would print FAIL yet slip past the failure list
    ok = mx <= TOL
    print(f"[{'OK ' if ok else 'FAIL'}] {name}: max|diff| = {mx:.3g} over {got.shape[0]} rows")
    if not ok:
        failures.append(f"{name}: max diff {mx}")


# ------------------------------------------------------------------ l6
rows = []
for lb, x in groups.items():
    w, lam, expl, cum = pca(x[:, :16], 5)
    cv = pca_cv_err(x[:, :16], 5, 5)
    for c in range(5):
        rows.append({"eigenvalue": lam[c], "explained": expl[c],
                     "cumulative": cum[c], "cv_recon_err": cv.mean()})
check("l6_pca_cv", rows, load("l6_pca_cv").sort_values(["label", "component"]),
      ["eigenvalue", "explained", "cumulative", "cv_recon_err"])

# ------------------------------------------------------------------ l7
rows = []
cca_cache = {}
for lb, m in groups.items():
    x, y = m[:, :8], m[:, 8:16]
    a, b, r, lam = cca(x, y, 3)
    cca_cache[lb] = (a, r)
    cv = cca_cv(x, y, 3, 5)
    for c in range(3):
        rows.append({"r": r[c], "cv_r_mean": cv[:, c].mean(),
                     "cv_r_std": cv[:, c].std(ddof=1), "ridge_lambda": lam})
check("l7_cca_cv", rows, load("l7_cca_cv").sort_values(["label", "component"]),
      ["r", "cv_r_mean", "cv_r_std", "ridge_lambda"])

# ------------------------------------------- l7 at reference parameters
# 10 components / 10 folds over dims 0-9 vs 10-19 (the reference's
# parameter scale; same math, bigger blocks)
rows = []
for lb, m in groups.items():
    x, y = m[:, :10], m[:, 10:20]
    a, b, r, lam = cca(x, y, 10)
    cv = cca_cv(x, y, 10, 10)
    for c in range(10):
        rows.append({"r": r[c], "cv_r_mean": cv[:, c].mean(),
                     "cv_r_std": cv[:, c].std(ddof=1), "ridge_lambda": lam})
check("l7_cca_cv_ref10", rows,
      load("l7_cca_cv_ref10").sort_values(["label", "component"]),
      ["r", "cv_r_mean", "cv_r_std", "ridge_lambda"])

# ------------------------------------------------------------------ l8
li = con.execute(
    "SELECT l_returnflag, l_quantity::DOUBLE, l_discount::DOUBLE, l_tax::DOUBLE, "
    f"l_extendedprice::DOUBLE FROM read_parquet('{sf_dir}/lineitem.parquet') "
    "ORDER BY l_returnflag, l_orderkey, l_linenumber").fetchall()
by_flag = {}
for flag, q, disc, tax, ep in li:
    by_flag.setdefault(flag, []).append((q, disc, tax, ep))
rows = []
for flag in sorted(by_flag):
    arr = np.array(by_flag[flag])
    beta, se, t, pv, lo, hi, r2, adj, aic, bic, dof = ols(arr[:, :3], arr[:, 3])
    # output is ORDER BY group, term: intercept, l_discount, l_quantity, l_tax
    for j in (0, 2, 1, 3):
        rows.append({"beta": beta[j], "se": se[j], "t_stat": t[j], "p_value": pv[j],
                     "ci_lo": lo[j], "ci_hi": hi[j], "r2": r2, "adj_r2": adj,
                     "aic": aic, "bic": bic, "dof": dof})
check("l8_glm_stats", rows, load("l8_glm_stats").sort_values(["group", "term"]),
      ["beta", "se", "t_stat", "p_value", "ci_lo", "ci_hi", "r2", "adj_r2",
       "aic", "bic", "dof"])

# ------------------------------------------------------------------ l9
rows = []
for lb, m in groups.items():
    y, x = m[:, 0], m[:, 1:13]
    base = ols(x, y)[0]
    order = sorted(range(12), key=lambda j: -abs(base[j + 1]))
    for rho in range(0, 95, 5):
        n_drop = int(round(12 * rho / 100.0))
        keep = sorted(order[n_drop:])
        if len(keep) < 2:  # engine/reference n_keep >= 2 guard: NaN row
            rows.append({"n_kept": len(keep), "r2": float("nan"),
                         "r2_mc_mean": float("nan"), "r2_mc_std": float("nan")})
            continue
        r2 = max(ols(x[:, keep], y)[6], 0.0)
        mc = []
        for t_it in range(10):
            key = lambda j: (hrand(lb * 1000000 + rho * 10000 + t_it * 100 + j, 777), j)
            keep_r = sorted(sorted(range(12), key=key)[:len(keep)])
            mc.append(max(ols(x[:, keep_r], y)[6], 0.0))
        mc = np.array(mc)
        rows.append({"n_kept": len(keep), "r2": r2, "r2_mc_mean": mc.mean(),
                     "r2_mc_std": mc.std(ddof=1)})
check("l9_sensitivity_sweep", rows,
      load("l9_sensitivity_sweep").sort_values(["label", "rho_pct"]),
      ["n_kept", "r2", "r2_mc_mean", "r2_mc_std"])

# ------------------------------------------------------------------ l10
subs = {lb: pca(x[:, :16], 3)[0] for lb, x in groups.items()}
labels = sorted(subs)
rows = []
for i, la in enumerate(labels):
    for lb in labels[i + 1:]:
        th = principal_angles(subs[la], subs[lb])
        rows.append({"theta_min": th.min(), "theta_max": th.max(),
                     "theta_mean": th.mean()})
check("l10_principal_angles", rows,
      load("l10_principal_angles").sort_values(["label_a", "label_b"]),
      ["theta_min", "theta_max", "theta_mean"])

# ------------------------------------------------------------- l11 / l12
rows11, rows12 = [], []
for lb, m in groups.items():
    w16, lam, _, _ = pca(m[:, :16], 5)
    a, r = cca_cache[lb]
    w = w16[:8, :]                      # shared support dims 0-7
    shared = 0.0
    for k in range(a.shape[1]):
        part = np.array([(a[:, k] @ w[:, i]) ** 2 for i in range(5)])
        alpha = part / part.sum()
        ent = -np.sum(np.where(alpha > 0, alpha * np.log(alpha), 0.0))
        rows11.append({"eff_dim": math.exp(ent)})
        shared += r[k] ** 2 * (part * lam).sum()
    total = lam.sum()
    rows12.append({"total_var": total, "shared_var": shared,
                   "private_var": total - shared, "shared_frac": shared / total})
check("l11_participation", rows11,
      load("l11_participation").sort_values(["label", "cca_comp"]), ["eff_dim"])
check("l12_variance_decomposition", rows12,
      load("l12_variance_decomposition").sort_values(["label"]),
      ["total_var", "shared_var", "private_var", "shared_frac"])

# ------------------------------------------------------------------ l15
rows = []
for lb, m in groups.items():
    w, *_ = pca(m[:, :16], 1)
    loadings = sorted(((j, w[j, 0]) for j in range(16)), key=lambda t: (-t[1], t[0]))
    for rk, (j, wgt) in enumerate(loadings):
        rows.append({"sort_rank": rk + 1, "dim": j, "pc1_weight": wgt})
check("l15_rastermap_order", rows,
      load("l15_rastermap_order").sort_values(["label", "sort_rank"]),
      ["sort_rank", "dim", "pc1_weight"])

# ------------------------------------------------------------------ t1
# p_exact = exact two-sided t p-value from the (already SQL-oracled)
# rounded t_stat and n — independently re-derived here through this
# file's own betainc-based t_two_sided_p.
t1 = load("t1_pearson_corr").sort_values("event_type")
rows = [{"p_exact": round(t_two_sided_p(t, n - 2), 6)}
        for t, n in zip(t1["t_stat"], t1["n"])]
check("t1_pearson_corr", rows, t1, ["p_exact"])

# ------------------------------------------------- t2_wilcoxon_exact
# Independent replay of the scipy exact-mode convention: per-region
# paired diffs recomputed straight from the raw parquet, the W+ null
# distribution built by numpy polynomial convolution (a DIFFERENT
# construction than the engine's in-place subset-sum DP), and
# p = min(1, 2*min(P(W<=w), P(W>=w))).
pairs = con.execute(f"""
    SELECT n.n_regionkey AS rk,
      SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END)
        - SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS diff
    FROM read_parquet('{sf_dir}/customer.parquet') c
    JOIN read_parquet('{sf_dir}/orders.parquet') o ON o.o_custkey = c.c_custkey
    JOIN read_parquet('{sf_dir}/nation.parquet') n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_regionkey, c.c_nationkey""").df()
rows = []
for rk in sorted(pairs["rk"].unique()):
    d = pairs[pairs["rk"] == rk]["diff"].to_numpy(dtype=np.float64)
    d = d[d != 0]
    if d.size == 0:
        continue
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(d.size)
    i = 0
    ties = False
    while i < d.size:
        j = i
        while j + 1 < d.size and ad[order[j + 1]] == ad[order[i]]:
            j += 1
        ties = ties or j > i
        ranks[order[i:j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    w_plus = ranks[d > 0].sum()
    if ties or d.size > 25:
        p = float("nan")
    else:
        dist = np.array([1], dtype=np.int64)  # counts over achievable W+
        for r in range(1, d.size + 1):
            shifted = np.concatenate([np.zeros(r, dtype=np.int64), dist])
            dist = np.concatenate([dist, np.zeros(r, dtype=np.int64)]) + shifted
        w = int(round(w_plus))
        pl = dist[:w + 1].sum() / 2.0 ** d.size
        pg = dist[w:].sum() / 2.0 ** d.size
        p = round(min(1.0, 2.0 * min(pl, pg)), 6)
    rows.append({"n_eff": d.size, "w_plus": round(w_plus, 2), "p_exact": p})
check("t2_wilcoxon_exact", rows,
      load("t2_wilcoxon_exact").sort_values("region_key"),
      ["n_eff", "w_plus", "p_exact"])

# ------------------------------------------- t10 Mann-Whitney U (numpy leg)
# Independent re-derivation of the per-day rank-sum test: average ranks
# via stable sort, tie-corrected sigma, no continuity correction.
if glob.glob(f"{out_dir}/t10_mann_whitney/*.parquet"):
    ev = con.execute(f"""
        SELECT CAST(epoch_us(ts) // 1000000 AS BIGINT) // 86400 AS day,
               event_type, value
        FROM read_parquet('{sf_dir}/events.parquet')
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL""").df()
    rows = []
    for day in sorted(ev["day"].unique()):
        d = ev[ev["day"] == day]
        v = d["value"].to_numpy(dtype=np.float64)
        is1 = (d["event_type"] == "click").to_numpy()
        n1, n2 = int(is1.sum()), int((~is1).sum())
        if n1 < 1 or n2 < 1 or n1 + n2 < 3:
            continue
        order = np.argsort(v, kind="stable")
        ranks = np.empty(v.size)
        i = 0
        tie3 = 0
        while i < v.size:
            j = i
            while j + 1 < v.size and v[order[j + 1]] == v[order[i]]:
                j += 1
            t = j - i + 1
            tie3 += t * t * t - t
            ranks[order[i:j + 1]] = (i + j + 2) / 2.0
            i = j + 1
        r1 = ranks[is1].sum()
        n = n1 + n2
        u1 = r1 - n1 * (n1 + 1) / 2.0
        sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
        rows.append({"n1": n1, "n2": n2, "u1": round(u1, 2),
                     "z": round((u1 - n1 * n2 / 2.0) / sigma, 4)})
    check("t10_mann_whitney", rows,
          load("t10_mann_whitney").sort_values("day"), ["n1", "n2", "u1", "z"])

# --------------------------------------- t11 chi-square (numpy leg)
# Independent re-derivation: dense contingency grid (absent cells get
# their expected count), Wilson-Hilferty z, A&S upper-tail polynomial.
if glob.glob(f"{out_dir}/t11_chi2_independence/*.parquet"):
    cg = con.execute(f"""
        SELECT lang, source, count(*) AS o
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NOT NULL GROUP BY 1, 2""").df()
    piv = cg.pivot_table(index="lang", columns="source", values="o",
                         fill_value=0).values.astype(np.float64)
    ntot = piv.sum()
    e = piv.sum(1, keepdims=True) @ piv.sum(0, keepdims=True) / ntot
    chi2 = round(float(np.round((piv - e) ** 2 / e, 6).sum()), 4)
    r, c = piv.shape
    dfree = (r - 1) * (c - 1)
    z = round((np.cbrt(chi2 / dfree) - (1 - 2 / (9 * dfree)))
              / math.sqrt(2 / (9 * dfree)), 4)
    u = 1.0 / (1.0 + 0.2316419 * abs(z))
    q = (0.3989422804014327 * math.exp(-(z * z) / 2.0) * u *
         (0.319381530 + u * (-0.356563782 + u * (1.781477937 +
          u * (-1.821255978 + u * 1.330274429)))))
    p = round(q if z >= 0 else 1.0 - q, 6)
    rows = [{"n": ntot, "df": dfree, "chi2": chi2, "z": z, "p_upper": p,
             "cramers_v": round(math.sqrt(chi2 / (ntot * min(r - 1, c - 1))), 6)}]
    check("t11_chi2_independence", rows, load("t11_chi2_independence"),
          ["n", "df", "chi2", "z", "p_upper", "cramers_v"])

# ------------------------------- curate_quality_classifier (numpy IRLS)
# Independent replay of Classifier.logisticScore: identical 6-dp feature
# derivation (via DuckDB), 3 Newton steps from beta = 0 with per-row
# 6-dp-rounded Hessian/gradient terms and ridge 1e-6, then sigmoid scores.
if glob.glob(f"{out_dir}/curate_quality_classifier/*.parquet"):
    feats = con.execute(f"""
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               round(((length(text) - length(replace(text, 'th', ''))) // 2)::DOUBLE
                     / len(string_split(text, ' ')), 6) AS x1,
               round(((length(text) - length(replace(text, 'he', ''))) // 2)::DOUBLE
                     / len(string_split(text, ' ')), 6) AS x2,
               round(len(list_filter(string_split(text, ' '),
                     w -> w IN ('the','a','and','of','to')))::DOUBLE
                     / len(string_split(text, ' ')), 6) AS x3,
               round((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
                     / (len(string_split(text, ' ')) * 10), 6) AS x4
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NOT NULL ORDER BY doc_id""").fetchall()
    arr = np.array(feats, dtype=np.float64)
    X = np.hstack([np.ones((len(arr), 1)), arr[:, 2:6]])
    yv = arr[:, 1]

    # Spark rounds a DOUBLE by converting Double.toString (the shortest
    # round-trip decimal) to BigDecimal and quantizing HALF_UP; np.round
    # is half-even on the binary value — they disagree on every product
    # that lands on an exact 6-dp half (common in IRLS step 1, where
    # w = 0.25 exactly). Replicate Spark: repr() is the same shortest
    # string, decimal.quantize the same HALF_UP.
    from decimal import Decimal, ROUND_HALF_UP
    q6 = Decimal("0.000001")

    def r6(v):
        return np.array([float(Decimal(repr(float(t))).quantize(
            q6, ROUND_HALF_UP)) for t in v])

    beta = np.zeros(5)
    for _ in range(3):
        pr = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = pr * (1.0 - pr)
        H = np.zeros((5, 5))
        g = np.zeros(5)
        for i in range(5):
            g[i] = np.sum(r6((yv - pr) * X[:, i]))
            for j in range(i, 5):
                v = np.sum(r6(w * X[:, i] * X[:, j]))
                H[i, j] = v
                H[j, i] = v
        H += 1e-6 * np.eye(5)
        beta = beta + np.linalg.solve(H, g)
    score = r6(1.0 / (1.0 + np.exp(-(X @ beta))))
    rows = [{"y": yv[i], "score": score[i],
             "keep": 1.0 if score[i] >= 0.5 else 0.0}
            for i in range(len(score))]
    check("curate_quality_classifier", rows,
          load("curate_quality_classifier").sort_values("doc_id"),
          ["y", "score", "keep"])

    # -------- curate_classifier_calibration (same scores, binned) -----
    # Replicates the Spark query bit-for-bit: fixed-width decile bins on
    # the DOUBLE product score*10 (same IEEE floor), per-bin DECIMAL(,6)
    # sums for conf/acc, HALF_UP rounding everywhere Spark rounds.
    if glob.glob(f"{out_dir}/curate_classifier_calibration/*.parquet"):
        import math
        def r6s(v):  # one scalar, Spark round(x, 6)
            return float(Decimal(repr(float(v))).quantize(q6, ROUND_HALF_UP))
        def dsum6(vals):  # stableSum: per-term DECIMAL(28,6), exact sum
            return float(sum(Decimal(repr(float(t))).quantize(
                q6, ROUND_HALF_UP) for t in vals))
        bins = {}
        for i in range(len(score)):
            b = min(int(math.floor(score[i] * 10.0)), 9)
            bins.setdefault(b, []).append(i)
        rows = []
        for b in sorted(bins):
            idx = bins[b]
            n = len(idx)
            conf = r6s(dsum6(score[j] for j in idx) / n)
            acc = r6s(dsum6(yv[j] for j in idx) / n)
            rows.append({"bin": float(b), "n": float(n), "conf": conf,
                         "acc": acc, "gap": r6s(abs(acc - conf))})
        n_tot = sum(r["n"] for r in rows)
        ece = r6s(dsum6(r["gap"] * r["n"] for r in rows) / n_tot)
        for r in rows:
            r["ece"] = ece
        check("curate_classifier_calibration", rows,
              load("curate_classifier_calibration").sort_values("bin"),
              ["bin", "n", "conf", "acc", "gap", "ece"])

# ------------------------------------ pipeline_region_cca (end-to-end)
# The entry-point composition: segmentation + gates re-derived in SQL
# (the stages ARE relational), the per-region CCA in numpy — fully
# independent of the engine's RangeJoin/MomentsAgg/Breeze path.
trial_rows = con.execute(f"""
    WITH e AS (SELECT *, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t
               FROM read_parquet('{sf_dir}/events.parquet')),
    trg AS (SELECT event_id AS trig_id, user_id, t AS trig_t FROM e
            WHERE event_type = 'purchase'),
    ser AS (SELECT user_id, t AS obs_t, value FROM e
            WHERE event_type <> 'purchase' AND value IS NOT NULL),
    seg AS (SELECT trg.trig_id, trg.user_id, ser.value,
                   CAST(FLOOR((ser.obs_t - trg.trig_t) / 14400.0) AS BIGINT) + 3 AS bi
            FROM ser JOIN trg ON ser.user_id = trg.user_id
             AND ser.obs_t >= trg.trig_t - 43200 AND ser.obs_t <= trg.trig_t + 28799),
    tri AS (SELECT trig_id, user_id,
                   {", ".join(f"coalesce(avg(CASE WHEN bi = {i} THEN value END), 0.0) AS bb{i}" for i in range(5))},
                   count(*) AS n_obs
            FROM seg GROUP BY 1, 2 HAVING count(*) >= 2),
    stab AS (SELECT user_id FROM tri GROUP BY 1 HAVING count(*) >= 3),
    tri2 AS (SELECT tri.* FROM tri SEMI JOIN stab ON tri.user_id = stab.user_id),
    cust AS (SELECT * FROM read_parquet('{sf_dir}/customer.parquet')),
    nat AS (SELECT * FROM read_parquet('{sf_dir}/nation.parquet')),
    regn AS (SELECT * FROM read_parquet('{sf_dir}/region.parquet')),
    reg AS (SELECT c_custkey, r_name FROM cust
            JOIN nat ON c_nationkey = n_nationkey
            JOIN regn ON n_regionkey = r_regionkey)
    SELECT r_name, bb0, bb1, bb2, bb3, bb4
    FROM tri2 JOIN reg ON tri2.user_id = reg.c_custkey
    ORDER BY r_name, trig_id""").fetchall()
by_region = {}
for r_name, *bb in trial_rows:
    by_region.setdefault(r_name, []).append(bb)
exp = {}
for r_name in sorted(by_region):
    m = np.asarray(by_region[r_name], dtype=np.float64)
    a, b, r, lam = cca(m[:, :3], m[:, 3:], 2)
    exp[r_name] = (float(len(m)),
                   r[0] if len(r) > 0 else 0.0, r[1] if len(r) > 1 else 0.0)
# A4 rollup row: mean of the (6dp-rounded, but we tolerate 5e-7) rs
exp["ALL (mean)"] = (float(sum(v[0] for v in exp.values())),
                     float(np.mean([v[1] for v in exp.values()])),
                     float(np.mean([v[2] for v in exp.values()])))
got_e2e = load("pipeline_region_cca").sort_values("region")
rows = [{"n_trials": exp[rn][0], "r_1": exp[rn][1], "r_2": exp[rn][2]}
        for rn in got_e2e["region"]]
assert sorted(got_e2e["region"]) == sorted(exp), (
    f"pipeline_region_cca regions {list(got_e2e['region'])} != {sorted(exp)}")
check("pipeline_region_cca", rows, got_e2e, ["n_trials", "r_1", "r_2"])

# ------------------------------ pipeline_glm_sensitivity (entry point C)
# The GLM lifecycle composition: per label (min-n gated), base OLS of
# dim0 on dims 1-12, rank by |beta| desc, refit sweep rho = 0:5:90,
# then the summary's concentration C = R2(0) - R2(50), the first rho
# whose refit R2 falls to <= half baseline, and the pooled mean row —
# all re-derived here through this file's own ols(), independent of
# the engine's moment-aggregate path.
exp_glm = {}
for lb, m in groups.items():
    if len(m) < 45:  # the query's F6 gate
        continue
    y, x = m[:, 0], m[:, 1:13]
    base = ols(x, y)[0]
    order = sorted(range(12), key=lambda j: -abs(base[j + 1]))
    r2s = {}
    for rho in range(0, 95, 5):
        n_drop = int(round(12 * rho / 100.0))
        keep = sorted(order[n_drop:])
        if len(keep) < 2:
            r2s[rho] = float("nan")
        else:
            r2s[rho] = max(ols(x[:, keep], y)[6], 0.0)
    r2_full, r2_half = r2s[0], r2s[50]
    # first-match on the engine's 6-dp values (both sides are rounded
    # there, so the threshold comparison must see the same grid)
    halves = [rho for rho in range(0, 95, 5)
              if not math.isnan(r2s[rho])
              and np.round(r2s[rho], 6) <= np.round(r2_full, 6) * 0.5]
    rho_half = float(min(halves)) if halves else float("nan")
    exp_glm[str(lb)] = {"n_vecs": float(len(m)), "r2_full": r2_full,
                        "r2_half": r2_half,
                        "concentration": r2_full - r2_half,
                        "rho_half": rho_half}
pooled_rho = [v["rho_half"] for v in exp_glm.values()
              if not math.isnan(v["rho_half"])]
exp_glm["ALL (mean)"] = {
    "n_vecs": float(sum(v["n_vecs"] for v in exp_glm.values())),
    "r2_full": float(np.mean([v["r2_full"] for v in exp_glm.values()])),
    "r2_half": float(np.mean([v["r2_half"] for v in exp_glm.values()])),
    "concentration": float(np.mean([v["concentration"] for v in exp_glm.values()])),
    "rho_half": float(np.mean(pooled_rho)) if pooled_rho else float("nan")}
got_glm = load("pipeline_glm_sensitivity").sort_values("label")
assert sorted(got_glm["label"]) == sorted(exp_glm), (
    f"pipeline_glm_sensitivity labels {list(got_glm['label'])} != {sorted(exp_glm)}")
rows = [exp_glm[lb] for lb in got_glm["label"]]
check("pipeline_glm_sensitivity", rows, got_glm,
      ["n_vecs", "r2_full", "r2_half", "concentration", "rho_half"])

if failures:
    print("\nFAILED:\n  " + "\n  ".join(failures))
    sys.exit(1)
print("\nall kernel cross-checks passed")
