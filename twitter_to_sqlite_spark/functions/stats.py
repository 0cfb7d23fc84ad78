"""Moment-based statistics: correlation matrices and A/B tests.

Both operators reduce to ONE partial-aggregate scan collecting raw
moment sums (n, Σx, Σy, Σxy, Σx², Σy²) and derive the statistic from
the moments with an arithmetic expression — the only shape that
(a) scales: a 100 TB fact table is one map-side-combined agg job, no
shuffle beyond the tiny per-group partials, and (b) cross-engine
reproduces: Spark's `corr`/`stddev` and DuckDB's use different
one-pass update formulas whose float noise diverges, while identical
moment sums fed through an identical expression agree to rounding.

Reference analogue: the reference's analytics surface is
count/min/max folds (twitter_to_sqlite/utils.py fetch_timeline's
since_id bookkeeping); these are the continuous-metric analogue a
warehouse user expects from the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corr_pairs(df: DataFrame, pairs: list[tuple[str, str]],
               decimals: int = 4) -> DataFrame:
    """Pearson correlation for each named column pair, all pairs in
    ONE aggregate scan. Rows where either side is NULL are excluded
    pairwise (SQL corr semantics). Returns (x_col, y_col, n, corr) —
    corr NULL when a side is constant or n < 2.

    r = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²),
    evaluated on the collected moments in the same operation order as
    the oracle so the rounded result is engine-stable. Sums are
    carried in DECIMAL(18,4) (values quantized HALF_UP to 4 decimals
    first — lossless for money-style columns) so the moments are
    EXACT and order-independent: the n·Σxy − Σx·Σy cancellation has
    zero accumulation noise on either engine.
    """
    # r10: project the decimal casts ONCE per column and the decimal
    # products ONCE per row before aggregating — the aggregate's
    # codegen re-evaluated cast+multiply per moment expression
    # (measured 2.3× on the lineitem scan; the summed decimal values,
    # and therefore the moments, are bit-identical).
    cols = sorted({c for p in pairs for c in p})
    proj = df.select(
        *[F.col(c).cast("double").alias(f"__x_{c}") for c in cols],
        *[F.col(c).cast("double").cast("decimal(18,4)")
          .alias(f"__d_{c}") for c in cols],
    )
    sq_cols = [(F.col(f"__d_{c}") * F.col(f"__d_{c}")).alias(f"__sq_{c}")
               for c in cols]
    pr_cols = [(F.col(f"__d_{xc}") * F.col(f"__d_{yc}")).alias(f"__pr_{i}")
               for i, (xc, yc) in enumerate(pairs)]
    proj = proj.select("*", *sq_cols, *pr_cols)
    aggs = []
    for i, (xc, yc) in enumerate(pairs):
        x, y = F.col(f"__x_{xc}"), F.col(f"__x_{yc}")
        ms = [
            F.count(F.when(x.isNotNull() & y.isNotNull(), F.lit(1))),
            F.sum(F.when(y.isNotNull(), F.col(f"__d_{xc}"))),
            F.sum(F.when(x.isNotNull(), F.col(f"__d_{yc}"))),
            F.sum(F.col(f"__pr_{i}")),
            F.sum(F.when(y.isNotNull(), F.col(f"__sq_{xc}"))),
            F.sum(F.when(x.isNotNull(), F.col(f"__sq_{yc}"))),
        ]
        for j, m in enumerate(ms):
            aggs.append(m.alias(f"__m{i}_{j}"))
    wide = proj.agg(*aggs)
    rows = []
    for i, (xc, yc) in enumerate(pairs):
        n = F.col(f"__m{i}_0").cast("double")
        sx = F.col(f"__m{i}_1").cast("double")
        sy = F.col(f"__m{i}_2").cast("double")
        sxy = F.col(f"__m{i}_3").cast("double")
        sxx = F.col(f"__m{i}_4").cast("double")
        syy = F.col(f"__m{i}_5").cast("double")
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        r = F.when(
            (n >= 2) & (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(vx) / F.sqrt(vy),
                    decimals),
        )
        rows.append(F.struct(
            F.lit(xc).alias("x_col"), F.lit(yc).alias("y_col"),
            F.col(f"__m{i}_0").alias("n"), r.alias("corr")))
    return (
        wide.select(F.explode(F.array(*rows)).alias("__s"))
        .select("__s.x_col", "__s.y_col", "__s.n", "__s.corr")
    )


def ab_welch(df: DataFrame, group_col: str, variant_col,
             value_col: str, decimals: int = 4,
             z_crit: float = 1.96) -> DataFrame:
    """Per-group two-sample Welch z-test between variant 0 and
    variant 1 of ``variant_col`` (a 0/1 integer column or expression —
    e.g. a deterministic hash of the unit id, so assignment is
    reproducible across engines and retries).

    One grouped aggregate collecting both variants' moments via
    conditional sums (no second shuffle, no self-join), then
    z = (mean₁ − mean₀) / sqrt(s₀²/n₀ + s₁²/n₁) with sample variances
    from the moments. The flag tests the ROUNDED z against z_crit so
    both engines decide the boundary identically. Returns (group,
    n_0, n_1, mean_0, mean_1, z_score, significant) — z NULL until
    both arms have ≥ 2 values and positive variance.
    """
    v = F.col(value_col).cast("double")
    arm = F.col(variant_col) if isinstance(variant_col, str) \
        else variant_col
    d = df.withColumn("__v", v).filter(F.col("__v").isNotNull())
    d = d.withColumn("__a", arm.cast("int"))

    def side(bit):
        cond = F.col("__a") == bit
        return [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{bit}"),
            F.sum(F.when(cond, F.col("__v"))).alias(f"__s{bit}"),
            F.sum(F.when(cond, F.col("__v") * F.col("__v")))
            .alias(f"__q{bit}"),
        ]

    g = d.groupBy(F.col(group_col)).agg(*(side(0) + side(1)))
    out = [F.col(group_col), F.col("n_0"), F.col("n_1")]
    means, vars_ = [], []
    for b in (0, 1):
        n = F.col(f"n_{b}").cast("double")
        s, q = F.col(f"__s{b}"), F.col(f"__q{b}")
        means.append(F.round(s / n, decimals).alias(f"mean_{b}"))
        vars_.append((q - s * s / n) / (n - 1))
    z = F.when(
        (F.col("n_0") >= 2) & (F.col("n_1") >= 2)
        & (vars_[0] + vars_[1] > 0),
        F.round(
            (F.col("__s1") / F.col("n_1") - F.col("__s0") / F.col("n_0"))
            / F.sqrt(vars_[1] / F.col("n_1") + vars_[0] / F.col("n_0")),
            decimals,
        ),
    )
    return g.select(
        *out, *means, z.alias("z_score"),
        F.coalesce(F.abs(z) > F.lit(z_crit), F.lit(False))
        .alias("significant"),
    )


def describe_numeric(df: DataFrame, columns: list[str],
                     decimals: int = 4) -> DataFrame:
    """Exact numeric profile of the named columns — ONE aggregate
    scan, one row out per column: (column, n_rows, n_null,
    n_distinct, min_val, max_val, mean). The df.describe()/summary()
    shape rebuilt for cross-engine exactness: count-distincts are
    exact (Spark plans the multi-distinct agg via Expand — still one
    scan), the mean is an exact DECIMAL(18,4) sum divided once, and
    min/max/mean surface as doubles rounded to `decimals`.

    Scale: a single map-side-combined aggregate job; the Expand for d
    distinct columns replays the scan's rows d+1 ways but never
    shuffles more than the partial-agg state. For approximate-distinct
    at extreme cardinality use sketch.kmv_distinct instead — this is
    the exact companion.
    """
    n_all = F.count(F.lit(1))
    aggs = [n_all.alias("__n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        d = col.cast("double")
        aggs += [
            F.count(c).alias(f"__k{i}"),
            F.countDistinct(c).alias(f"__d{i}"),
            F.min(d).alias(f"__mn{i}"),
            F.max(d).alias(f"__mx{i}"),
            F.sum(col.cast("decimal(18,4)")).alias(f"__s{i}"),
        ]
    wide = df.agg(*aggs)
    rows = []
    for i, c in enumerate(columns):
        k = F.col(f"__k{i}")
        rows.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - k).alias("n_null"),
            F.col(f"__d{i}").alias("n_distinct"),
            F.round(F.col(f"__mn{i}"), decimals).alias("min_val"),
            F.round(F.col(f"__mx{i}"), decimals).alias("max_val"),
            F.when(k > 0,
                   F.round(F.col(f"__s{i}").cast("double") / k, decimals))
            .alias("mean"),
        ))
    return (
        wide.select(F.explode(F.array(*rows)).alias("__s"))
        .select("__s.column", "__s.n_rows", "__s.n_null",
                "__s.n_distinct", "__s.min_val", "__s.max_val",
                "__s.mean")
    )


def roc_auc(df: DataFrame, label_col: str = "y",
            score_col: str = "prob", decimals: int = 6) -> DataFrame:
    """Exact ROC-AUC of a scored, labeled table — the Mann-Whitney
    rank-sum form with tie-aware average ranks, so the result equals
    P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) exactly.

    Shape: one groupBy on the (rounded) score collapses the corpus to
    ≤ |distinct scores| rows — for a probability rounded to 4 decimals
    that is ≤ 10,001 rows regardless of corpus size — then one
    cumulative window over those rows and one scalar agg. The window
    is single-partition but bounded by score CARDINALITY, not row
    count, so the plan survives 100 TB.

    All rank arithmetic stays integral (average ranks carried as
    2·rank to avoid .5 floats; sums in DECIMAL(38,0) so a trillion-row
    corpus cannot overflow), with ONE double division at the end —
    engine-exact to the rounding.

    Returns one row: (n_pos, n_neg, auc); auc NULL when a class is
    empty.
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    y = F.col(label_col).cast("long")
    g = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(y).alias("__np"))
    )
    w = (
        Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn(
        "__before",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("long")))
    # Σ over positives of 2·avg_rank, where avg_rank of a tie group
    # starting after `before` rows with n members is before+(n+1)/2.
    # Both FACTORS go to DECIMAL(38,0) before the multiply — a long
    # product would overflow first on the trillion-row corpus the
    # decimal sums exist for (the DuckDB twin multiplies in HUGEINT).
    agg = r.agg(
        F.sum(F.col("__np").cast("decimal(38,0)")
              * (2 * F.col("__before") + F.col("__n") + 1)
              .cast("decimal(38,0)")).alias("__r2"),
        F.sum("__np").alias("n_pos"),
        F.sum(F.col("__n") - F.col("__np")).alias("n_neg"),
    )
    npd = F.col("n_pos").cast("double")
    nnd = F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (F.col("__r2").cast("double") - npd * (npd + 1))
            / (2 * npd * nnd), decimals),
    )
    return agg.select("n_pos", "n_neg", auc.alias("auc"))


def calibration_bins(df: DataFrame, label_col: str = "y",
                     score_col: str = "prob", n_bins: int = 10,
                     decimals: int = 6) -> DataFrame:
    """Reliability-diagram buckets for a probabilistic classifier:
    fixed-width score bins with each bin's exact mean predicted
    probability vs the empirical positive rate, and the |gap| whose
    n-weighted sum is the expected calibration error (ECE).

    One grouped aggregate on the bin id (≤ n_bins groups, map-side
    combined — a 100 TB scoring table reduces to n_bins rows in one
    scan). The mean score is an exact DECIMAL(18,4) sum (lossless for
    a probability already rounded to 4) divided once; the gap is
    derived from the same exact sums in a fixed expression order.

    Returns (bin, n, avg_score, pos_rate, gap), observed bins only.
    """
    s = F.col(score_col)
    y = F.col(label_col).cast("long")
    b = F.least(F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1))
    g = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s.cast("decimal(18,4)")).alias("__sp"),
            F.sum(y).alias("__np"),
        )
    )
    nd = F.col("n").cast("double")
    spd = F.col("__sp").cast("double")
    npd = F.col("__np").cast("double")
    return g.select(
        "bin", "n",
        F.round(spd / nd, decimals).alias("avg_score"),
        F.round(npd / nd, decimals).alias("pos_rate"),
        F.round(F.abs(spd / nd - npd / nd), decimals).alias("gap"),
    )


# Quantization scale for embedding_profile: float32 has a 24-bit
# mantissa, so val·2²⁴ is EXACT in float64 for |val| < 1 and floor()
# of it is a deterministic integer on every engine — the moments are
# then exact integer sums with no decimal rounding-mode dependence.
_EMB_SCALE = float(1 << 24)


def embedding_profile(df: DataFrame, vec_col: str = "embedding",
                      decimals: int = 6) -> DataFrame:
    """Per-dimension profile of an array<float> embedding column —
    n / mean / variance / min / max per position — the drift monitor
    for a vector pipeline (a collapsed dimension, a normalization bug,
    or an upstream model swap shows up here before recall drops).

    Values are quantized to 2⁻²⁴ (exact for float32 inputs in (-1, 1);
    below float32's own 6-7 significant digits elsewhere) so the
    moment sums are exact integers in DECIMAL(38,0) — engine- and
    order-independent — with the two final divisions in a fixed
    expression order. min/max are exact on the raw values.

    Shape: posexplode widens the scan by the dimension count, then ONE
    map-side-combined aggregate on ≤ dim groups. No shuffle beyond the
    dim-sized partials; no UDF.
    """
    ex = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "__v"))
        .filter(F.col("__v").isNotNull())
        .select(F.col("pos").cast("long").alias("pos"),
                F.col("__v").cast("double").alias("__v"))
    )
    iv = F.floor(F.col("__v") * F.lit(_EMB_SCALE)).cast("long")
    g = ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(iv.cast("decimal(38,0)")).alias("__s"),
        F.sum((iv * iv).cast("decimal(38,0)")).alias("__q"),
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
    )
    nd = F.col("n").cast("double")
    m = F.col("__s").cast("double") / nd
    return g.select(
        "pos", "n",
        F.round(m / F.lit(_EMB_SCALE), decimals).alias("mean"),
        F.round(
            (F.col("__q").cast("double") / nd - m * m)
            / F.lit(_EMB_SCALE * _EMB_SCALE), decimals).alias("var"),
        F.round(F.col("__mn"), decimals).alias("min_val"),
        F.round(F.col("__mx"), decimals).alias("max_val"),
    )


def grouped_trend(df: DataFrame, group_col: str, x_col: str,
                  y_col: str, decimals: int = 4) -> DataFrame:
    """Per-group OLS trend line y = a + b·x — slope, intercept and R²
    from each group's exact DECIMAL moments, ONE grouped aggregate
    scan (the per-key regression a metrics pipeline fits per series:
    trend detection, burn-down rates, drift slopes).

    b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), a = (Σy − b·Σx)/n,
    R² = b²·(n·Σx² − (Σx)²) / (n·Σy² − (Σy)²), all derived in a fixed
    expression order from moments that are exact, so the rounded
    output is engine-stable. Returns (group, n, slope, intercept,
    r2) — NULL when x is constant or n < 2; R² NULL when y is
    constant.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    xd = x.cast("decimal(18,4)")
    yd = y.cast("decimal(18,4)")
    both = x.isNotNull() & y.isNotNull()
    g = (
        df.filter(both)
        .groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("__sx"), F.sum(yd).alias("__sy"),
            F.sum(xd * yd).alias("__sxy"),
            F.sum(xd * xd).alias("__sxx"),
            F.sum(yd * yd).alias("__syy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    b = (n * sxy - sx * sy) / vx
    fit = (F.col("n") >= 2) & (vx > 0)
    return g.select(
        group_col, "n",
        F.when(fit, F.round(b, decimals)).alias("slope"),
        F.when(fit, F.round((sy - b * sx) / n, decimals))
        .alias("intercept"),
        F.when(fit & (vy > 0),
               F.round(b * b * vx / vy, decimals)).alias("r2"),
    )


# Poisson(1) CDF thresholds scaled to parts-per-million, so the
# bootstrap draw is a pure INTEGER comparison on the portable hash —
# no float CDF evaluation to diverge between engines. P(W<=k) for
# k=0..6; draws above the last threshold get weight 7.
POISSON1_PPM = [367879, 735759, 919699, 981012, 996340, 999406, 999917]


def _poisson1_weight(u):
    """Inverse-CDF Poisson(1) draw from an integer u uniform on
    [0, 1e6): the per-(row, resample) weight of the Poisson bootstrap
    (each bootstrap replica includes a row W ~ Poisson(1) times —
    the streaming-friendly stand-in for multinomial resampling)."""
    expr = None
    for k, t in enumerate(POISSON1_PPM):
        cond = u < F.lit(t)
        expr = F.when(cond, F.lit(k)) if expr is None else \
            expr.when(cond, F.lit(k))
    return expr.otherwise(F.lit(len(POISSON1_PPM))).cast("long")


def auc_bootstrap(df: DataFrame, label_col: str = "y",
                  score_col: str = "prob", id_col: str = "doc_id",
                  n_resamples: int = 8, salt: str = "boot",
                  decimals: int = 6) -> DataFrame:
    """Deterministic Poisson-bootstrap uncertainty for the exact AUC:
    ``n_resamples`` replicas, each reweighting every row by an
    independent Poisson(1) draw derived from md5(id, salt, replica) —
    a pure function of the data, so the whole confidence band is
    reproducible across runs, engines, and retries (the property a
    committed eval number needs; random resampling can never
    cross-check). Returns one row per replica: (b, w_pos, w_neg, auc).

    The per-replica AUC is the weighted tie-aware Mann-Whitney
    statistic: with W1(s)/W0(s) the positive/negative weight at score
    s, AUC_b = Σ_s W1(s)·(cumW0(<s) + ½·W0(s)) / (W1·W0) — identical
    to :func:`roc_auc` at unit weights. Halves are avoided by carrying
    2·cumW0+W0; both factors go to DECIMAL(38,0) before the multiply,
    one double division at the end.

    Scale: the corpus explodes ×B but immediately collapses to
    ≤ B·|distinct scores| rows in one map-side-combined aggregate; the
    only window is partitioned by replica and bounded by score
    CARDINALITY, not corpus size — the roc_auc plan, B times in one
    pass.
    """
    from pyspark.sql import Window

    y = F.col(label_col).cast("long")
    base = df.filter(
        F.col(score_col).isNotNull() & y.isNotNull()).select(
        F.col(id_col).alias("__id"),
        y.alias("__y"),
        F.col(score_col).alias("__s"),
        F.explode(F.array(*[F.lit(b) for b in
                            range(1, n_resamples + 1)])).alias("b"),
    )
    u = (
        F.conv(F.substring(F.md5(F.concat_ws(
            "#", F.col("__id").cast("string"), F.lit(salt),
            F.col("b").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 1_000_000
    )
    wtd = base.withColumn("__w", _poisson1_weight(u))
    g = wtd.groupBy("b", "__s").agg(
        F.sum(F.col("__w") * F.col("__y")).alias("__w1"),
        F.sum(F.col("__w") * (1 - F.col("__y"))).alias("__w0"),
    )
    w = (
        Window.partitionBy("b").orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn(
        "__w0bef",
        F.coalesce(F.sum("__w0").over(w), F.lit(0).cast("long")))
    agg = r.groupBy("b").agg(
        F.sum(F.col("__w1").cast("decimal(38,0)")
              * (2 * F.col("__w0bef") + F.col("__w0"))
              .cast("decimal(38,0)")).alias("__num2"),
        F.sum("__w1").alias("w_pos"),
        F.sum("__w0").alias("w_neg"),
    )
    wp = F.col("w_pos").cast("double")
    wn = F.col("w_neg").cast("double")
    auc = F.when(
        (F.col("w_pos") > 0) & (F.col("w_neg") > 0),
        F.round(F.col("__num2").cast("double") / (2 * wp * wn), decimals),
    )
    return agg.select("b", "w_pos", "w_neg", auc.alias("auc"))


def grouped_roc_auc(df: DataFrame, group_col: str, label_col: str = "y",
                    score_col: str = "prob",
                    decimals: int = 6) -> DataFrame:
    """Exact tie-aware ROC-AUC per group — :func:`roc_auc`'s algebra
    with every stage keyed by the group: does the scorer rank well in
    EVERY stratum (language, source, shard), not just on average? The
    Simpson's-paradox check a gating classifier needs before its
    threshold is applied corpus-wide.

    Same scale shape as the global form: the corpus collapses to
    ≤ |groups|·|distinct scores| rows in one map-side-combined
    aggregate; the cumulative window partitions by GROUP (bounded by
    per-group score cardinality, never corpus size). Returns one row
    per group: (group, n_pos, n_neg, auc).
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    y = F.col(label_col).cast("long")
    g = (
        df.filter(s.isNotNull() & y.isNotNull()
                  & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"), s.alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(y).alias("__np"))
    )
    w = (
        Window.partitionBy("__g").orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn(
        "__before",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("long")))
    agg = r.groupBy("__g").agg(
        F.sum(F.col("__np").cast("decimal(38,0)")
              * (2 * F.col("__before") + F.col("__n") + 1)
              .cast("decimal(38,0)")).alias("__r2"),
        F.sum("__np").alias("n_pos"),
        F.sum(F.col("__n") - F.col("__np")).alias("n_neg"),
    )
    npd = F.col("n_pos").cast("double")
    nnd = F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (F.col("__r2").cast("double") - npd * (npd + 1))
            / (2 * npd * nnd), decimals),
    )
    return agg.select(F.col("__g").alias(group_col),
                      "n_pos", "n_neg", auc.alias("auc"))


def seasonal_naive_eval(df: DataFrame, ts_col: str = "ts",
                        train_last_day: int = 20,
                        test_days: tuple[int, int] = (21, 30),
                        decimals: int = 6) -> DataFrame:
    """Seasonal-naive forecast baseline + its error — the capacity-
    planning eval loop: predict each hour-of-day's event count as the
    train window's per-day mean for that hour, then score the
    prediction on the held-out days. Returns one row per hour (0-23):
    the prediction, the test window's actual per-day mean, and the
    MAE over test days — zero-event (day, hour) cells included via a
    dense generated spine, since 'no events at 3am' is exactly what
    the baseline must be scored on.

    Any real forecaster deployed on the stream must beat this number;
    publishing it first is the 'measure, don't guess' gate for
    forecasting work. Split is day-of-month within the fixture's
    single month (callers with real calendars pass timestamps
    through date arithmetic instead).

    Scale: two hour-keyed count aggs (map-side combined) + a
    24×|test_days| generated spine — the eval frame is
    constant-bounded regardless of corpus size. Per-hour MAE folds
    over the ≤|test_days| collected cells in day order, so the floats
    are engine-identical at the rounded grain.
    """
    hr = F.hour(F.col(ts_col))
    day = F.dayofmonth(F.col(ts_col))
    lo, hi = test_days
    n_train = float(train_last_day)
    n_test = float(hi - lo + 1)

    spark = df.sparkSession
    hours = spark.range(24).select(F.col("id").cast("int").alias("hour"))
    tc = (df.filter(day <= train_last_day)
          .groupBy(hr.alias("hour")).agg(F.count(F.lit(1)).alias("__tc")))
    pred = hours.join(tc, "hour", "left").select(
        "hour",
        (F.coalesce("__tc", F.lit(0)).cast("double") / n_train)
        .alias("__pred"))
    cells = pred.select(
        "hour", "__pred",
        F.explode(F.sequence(F.lit(lo), F.lit(hi))).alias("day"))
    ac = (df.filter((day >= lo) & (day <= hi))
          .groupBy(day.alias("day"), hr.alias("hour"))
          .agg(F.count(F.lit(1)).alias("__ac")))
    j = cells.join(ac, ["day", "hour"], "left").select(
        "hour", "day", "__pred",
        F.coalesce("__ac", F.lit(0)).cast("long").alias("__ac"))
    terms = j.groupBy("hour").agg(
        F.first("__pred").alias("__pred"),
        F.sum("__ac").alias("__atot"),
        F.sort_array(F.collect_list(F.struct(
            "day",
            F.abs(F.col("__ac").cast("double") - F.col("__pred"))
            .alias("__e")))).alias("__ts"))
    mae = (F.aggregate("__ts", F.lit(0.0),
                       lambda acc, s: acc + s["__e"]) / n_test)
    return terms.select(
        "hour",
        F.round("__pred", decimals).alias("pred"),
        F.round(F.col("__atot").cast("double") / n_test, decimals)
        .alias("actual_mean"),
        F.round(mae, decimals).alias("mae"),
    )


def spearman_rho(df: DataFrame, x_col: str, y_col: str,
                 decimals: int = 6) -> DataFrame:
    """Exact Spearman rank correlation between two discrete signals —
    the scorer-agreement check Pearson can't give (corr_pairs measures
    linear co-movement; curation cares whether two quality signals
    RANK documents the same way, which is Pearson over tie-averaged
    ranks).

    Shape (the roc_auc device, applied twice): each marginal collapses
    to its |distinct values| count table, one bounded cumulative
    window per marginal turns counts into tie-averaged ranks (carried
    as 2·rank so they stay integral), and the joint (x, y) count table
    joins both rank maps. The corpus is touched by exactly two
    map-side-combined aggs; every window runs over value CARDINALITY,
    not row count, so the plan survives 100 TB of rows with a bounded
    score domain (the caller rounds continuous signals first, as
    roc_auc documents).

    Moment sums are DECIMAL(38,0)-exact: with N ≤ 10¹² rows the worst
    term Σ n·(2rx)·(2ry) ≤ N·(2N)² = 4·10³⁶ < 10³⁸, so the sums are
    order-independent on both engines; ONE double expression at the
    end (identical op tree in the DuckDB twin) derives ρ.

    Returns one row: (n, nx, ny, rho) — rho NULL when either marginal
    is constant (zero rank variance).
    """
    from pyspark.sql import Window

    x = F.col(x_col)
    y = F.col(y_col)
    base = (df.filter(x.isNotNull() & y.isNotNull())
            .select(x.alias("__x"), y.alias("__y")))
    joint = base.groupBy("__x", "__y").agg(F.count(F.lit(1)).alias("__n"))

    def rank2(col: str, out: str) -> DataFrame:
        m = base.groupBy(col).agg(F.count(F.lit(1)).alias("__m"))
        w = (Window.orderBy(col)
             .rowsBetween(Window.unboundedPreceding, -1))
        before = F.coalesce(F.sum("__m").over(w), F.lit(0).cast("long"))
        return m.select(
            col,
            (2 * before + F.col("__m") + 1).alias(out))

    j = (joint
         .join(rank2("__x", "__rx2"), "__x")
         .join(rank2("__y", "__ry2"), "__y"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = j.agg(
        F.sum("__n").alias("n"),
        F.countDistinct("__x").alias("nx"),
        F.countDistinct("__y").alias("ny"),
        F.sum(d(F.col("__n")) * d(F.col("__rx2"))).alias("__sx"),
        F.sum(d(F.col("__n")) * d(F.col("__ry2"))).alias("__sy"),
        # Each factor casts to DECIMAL(38,0) BEFORE the multiply (the
        # roc_auc convention, mirroring the twin's HUGEINT op tree):
        # rx2/ry2 reach ~2N, so a LONG inner product ~4N² wraps past
        # ~1.5e9 rows, silently breaking the documented 10¹² bound.
        F.sum(d(F.col("__n")) * d(F.col("__rx2")) * d(F.col("__ry2")))
        .alias("__sxy"),
        F.sum(d(F.col("__n")) * d(F.col("__rx2")) * d(F.col("__rx2")))
        .alias("__sxx"),
        F.sum(d(F.col("__n")) * d(F.col("__ry2")) * d(F.col("__ry2")))
        .alias("__syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    cov = nd * F.col("__sxy").cast("double") - sx * sy
    vx = nd * F.col("__sxx").cast("double") - sx * sx
    vy = nd * F.col("__syy").cast("double") - sy * sy
    rho = F.when((vx > 0) & (vy > 0),
                 F.round(cov / F.sqrt(vx * vy), decimals))
    return agg.select("n", "nx", "ny", rho.alias("rho"))


def mutual_info_bits(df: DataFrame, vec_col: str = "embedding",
                     label_col: str = "label", n_dims: int = 16,
                     decimals: int = 6) -> DataFrame:
    """Per-dimension mutual information between an embedding sign bit
    and the class label — the feature-ranking probe that tells a
    training pipeline which representation dimensions carry label
    signal (an all-zero-MI profile means the embedding model never saw
    the taxonomy; one dominant dim means a shortcut feature).

    I(bit_d; label) = Σ_{b,ℓ} p(b,ℓ)·ln( p(b,ℓ) / (p(b)·p(ℓ)) ),
    computed from EXACT joint counts: one posexplode scan collapses
    the corpus to the (dim, bit, label) contingency cube — bounded by
    n_dims·2·|labels| cells regardless of row count — and every
    probability is a ratio of exact BIGINTs (counts multiplied in
    DOUBLE only inside the ln, mirroring the DuckDB twin's op tree,
    because n_bl·N overflows int64 at 10¹² rows). Per-dim terms fold
    in sorted (bit, label) order via F.aggregate so float addition
    order is engine-identical (the forecast_eval device; woe_iv set
    the ln precedent).

    Returns one row per dim: (dim, n, mi), mi rounded, sorted by the
    caller if a ranking is wanted.
    """
    v = F.col(vec_col)
    y = F.col(label_col)
    e = (df.filter(v.isNotNull() & y.isNotNull())
         .select(F.posexplode(F.slice(v, 1, n_dims)).alias("dim", "__x"),
                 y.alias("__y"))
         .select("dim", (F.col("__x") >= 0).cast("int").alias("__b"),
                 "__y"))
    # One corpus scan total: the cube is bounded (n_dims·2·|labels|
    # rows), so localCheckpoint it — otherwise each marginal re-derives
    # the scan+explode (Catalyst does not reuse common subplans) and
    # the corpus is read four times.
    cube = e.groupBy("dim", "__b", "__y").agg(
        F.count(F.lit(1)).alias("__nbl")).localCheckpoint()
    nb = cube.groupBy("dim", "__b").agg(F.sum("__nbl").alias("__nb"))
    nl = cube.groupBy("dim", "__y").agg(F.sum("__nbl").alias("__nl"))
    nn = cube.groupBy("dim").agg(F.sum("__nbl").alias("__nn"))
    j = (cube.join(nb, ["dim", "__b"]).join(nl, ["dim", "__y"])
         .join(nn, "dim"))
    nbl = F.col("__nbl").cast("double")
    term = (nbl / F.col("__nn").cast("double")) * F.log(
        (nbl * F.col("__nn").cast("double"))
        / (F.col("__nb").cast("double") * F.col("__nl").cast("double")))
    per_dim = j.groupBy("dim").agg(
        F.first("__nn").alias("n"),
        F.sort_array(F.collect_list(F.struct(
            "__b", "__y", term.alias("__t")))).alias("__terms"))
    mi = F.aggregate("__terms", F.lit(0.0), lambda acc, s: acc + s["__t"])
    return per_dim.select(
        "dim", "n", F.round(mi, decimals).alias("mi"))


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: float = 3.0, decimals: int = 2) -> DataFrame:
    """Robust per-group outlier audit: median / MAD (median absolute
    deviation) and the count of values beyond k·MAD — the
    anomaly screen that, unlike anomaly_zscore's mean/σ, a single
    wild value cannot drag (σ-based gates famously let one 10⁹
    outlier raise the bar enough to hide every other one).

    Median is defined exactly as the value at rank ⌈n/2⌉ of the
    count-collapsed distribution (lower middle for even n — a domain
    value, never an interpolation), computed with the roc_auc device:
    the corpus collapses to (group, rounded value, count) rows, one
    per-group cumulative window over value CARDINALITY yields the
    median, deviations re-aggregate the SAME bounded count table
    (|x−med| from counts, never from raw rows), and a second
    identical window yields the MAD.

    Returns one row per group: (group, n, median, mad, n_outliers).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.round(F.col(value_col).cast("double"), decimals)
    counts = (df.filter(g.isNotNull() & F.col(value_col).isNotNull())
              .groupBy(g.alias("__g"), v.alias("__v"))
              .agg(F.count(F.lit(1)).alias("__n"))
              .localCheckpoint())

    def group_median(cnt: DataFrame, val: str) -> DataFrame:
        w = (Window.partitionBy("__g").orderBy(val)
             .rowsBetween(Window.unboundedPreceding, 0))
        tot = Window.partitionBy("__g")
        c = (cnt.withColumn("__cum", F.sum("__n").over(w))
             .withColumn("__tot", F.sum("__n").over(tot)))
        # rank threshold ⌈tot/2⌉ = (tot+1) DIV 2, integer-exact
        thresh = F.expr("CAST((__tot + 1) DIV 2 AS BIGINT)")
        med = (c.filter(F.col("__cum") >= thresh)
               .groupBy("__g").agg(F.min(val).alias("__med")))
        return med

    med = group_median(counts, "__v")
    with_med = counts.join(med, "__g")
    devs = (with_med
            .groupBy("__g", F.abs(F.col("__v") - F.col("__med"))
                     .alias("__d"))
            .agg(F.sum("__n").alias("__n")))
    mad = group_median(
        devs.select("__g", F.col("__d").alias("__v"), "__n"), "__v") \
        .select("__g", F.col("__med").alias("__mad"))
    j = (with_med.join(mad, "__g"))
    out = j.groupBy("__g").agg(
        F.sum("__n").alias("n"),
        F.first("__med").alias("median"),
        F.first("__mad").alias("mad"),
        F.sum(F.when(F.abs(F.col("__v") - F.col("__med"))
                     > F.lit(float(k)) * F.col("__mad"), F.col("__n"))
              .otherwise(F.lit(0))).alias("n_outliers"))
    return out.select(F.col("__g").alias(group_col), "n",
                      "median", "mad", "n_outliers")


def embed_covariance(df: DataFrame, vec_col: str = "embedding",
                     n_dims: int = 16, decimals: int = 6) -> DataFrame:
    """Exact cross-dimension covariance of an embedding column — the
    input to PCA/whitening, the standard hygiene step before IVF,
    SemDeDup, or any cosine machinery that assumes roughly isotropic
    vectors (embedding_stats profiles each dim alone; correlated dims
    are invisible to it and quietly dominate every dot product).

    Population covariance over HALF_UP-quantized values (the
    corr_pairs device: DECIMAL(18,4) quantization makes every moment
    sum exact and partition-order-independent; ONE double expression
    at the end). Returns the upper triangle: (i, j, n, cov) for
    i ≤ j < n_dims.

    Scale: each row expands to its n_dims·(n_dims+1)/2 upper-triangle
    products via one inline transform+explode (no self-join, no
    shuffle before the aggregate), and the map-side-combined agg
    collapses everything to the bounded pair frame; per-dim marginal
    sums ride the bounded dim frame and broadcast-join back. The
    expansion factor is the honest outer-product cost — 136 terms per
    row at 16 dims — and is the reason `n_dims` slices rather than
    defaulting to the full vector.
    """
    v = F.col(vec_col)
    q = F.transform(F.slice(v, 1, n_dims),
                    lambda x: x.cast("double").cast("decimal(18,4)"))
    # Ragged-input contract: rows shorter than n_dims are EXCLUDED
    # up front (mirrored in the SQL twin). Without this, n counted
    # every row while sum(__xy) silently skipped the NULL products of
    # short vectors, biasing cov — the "exact covariance" claim held
    # only for rectangular input.
    base = (df.filter(v.isNotNull() & (F.size(v) >= n_dims))
            .select(q.alias("__q")))
    pairs_idx = [(i, j) for i in range(n_dims) for j in range(i, n_dims)]
    # The 136-struct upper-triangle array is rendered as ONE SQL
    # string (the similarity._const_mat device): building it with
    # per-struct F.struct/F.lit calls cost ~2s of py4j round-trips per
    # plan; the parsed expression is identical.
    terms = F.explode(F.expr("array(" + ",".join(
        f"named_struct('i', {i}, 'j', {j}, '__xy',"
        f" element_at(__q, {i + 1}) * element_at(__q, {j + 1}))"
        for i, j in pairs_idx) + ")")).alias("__t")
    pair_sums = (base.select(terms)
                 .select("__t.i", "__t.j", "__t.__xy")
                 .groupBy("i", "j")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("__xy").alias("__sxy")))
    marg = (base.select(F.posexplode("__q").alias("d", "__x"))
            .groupBy("d").agg(F.sum("__x").alias("__s"))
            .localCheckpoint())
    mi = marg.select(F.col("d").alias("i"), F.col("__s").alias("__si"))
    mj = marg.select(F.col("d").alias("j"), F.col("__s").alias("__sj"))
    j_ = (pair_sums.join(F.broadcast(mi), "i")
          .join(F.broadcast(mj), "j"))
    nd = F.col("n").cast("double")
    cov = (F.col("__sxy").cast("double") / nd
           - (F.col("__si").cast("double") / nd)
           * (F.col("__sj").cast("double") / nd))
    # "+ 0.0" flushes IEEE −0.0 (a rounded tiny-negative covariance)
    # to +0.0 — the DuckDB twin does the same, so the hash-compared
    # string never flips sign between engines
    return j_.select("i", "j", "n",
                     (F.round(cov, decimals) + F.lit(0.0)).alias("cov"))


def fano_factor(df: DataFrame, group_col: str, ts_col: str = "ts",
                decimals: int = 6) -> DataFrame:
    """Burstiness of each event stream: the Fano factor
    (variance/mean) of per-hour arrival counts — 1 under Poisson
    arrivals, ≫1 for bursty traffic, <1 for pacing. The dispersion
    diagnostic that tells capacity planning whether the seasonal-naive
    baseline's per-hour means (forecast_eval) are even the right
    model class.

    The hour grid is DENSE over each group's observed [first, last]
    hour (zero-count hours are real observations — omitting them
    inflates the mean and deflates the variance), built with
    sequence() on the group's own bounds. Population variance from
    exact integer moments (Σc, Σc² over BIGINT counts), one double
    expression at the end.

    Scale: one (group, hour)-keyed count agg + a per-group bounded
    spine join; moments are map-side-combined. Returns (group,
    n_hours, n_events, fano) — fano NULL when the mean is zero.
    """
    g = F.col(group_col)
    hr = F.date_trunc("hour", F.col(ts_col).cast("timestamp"))
    base = (df.filter(g.isNotNull() & F.col(ts_col).isNotNull())
            .select(g.alias("__g"), hr.alias("__h")))
    counts = base.groupBy("__g", "__h").agg(
        F.count(F.lit(1)).alias("__c"))
    bounds = counts.groupBy("__g").agg(
        F.min("__h").alias("__lo"), F.max("__h").alias("__hi"))
    spine = bounds.select(
        "__g",
        F.explode(F.sequence(
            "__lo", "__hi", F.expr("INTERVAL 1 HOUR"))).alias("__h"))
    dense = (spine.join(counts, ["__g", "__h"], "left")
             .select("__g", F.coalesce("__c", F.lit(0).cast("long"))
                     .alias("__c")))
    agg = dense.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("__c").alias("n_events"),
        F.sum(F.col("__c") * F.col("__c")).alias("__c2"))
    nh = F.col("n_hours").cast("double")
    s = F.col("n_events").cast("double")
    var = F.col("__c2").cast("double") / nh - (s / nh) * (s / nh)
    fano = F.when(F.col("n_events") > 0,
                  F.round(var / (s / nh), decimals))
    return agg.select(F.col("__g").alias(group_col),
                      "n_hours", "n_events", fano.alias("fano"))
