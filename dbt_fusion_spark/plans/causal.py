"""Causal inference on observational data: propensity scores + IPW.

The missing third leg next to the experiment readouts (ab_* tests) and
diff-in-diff: when treatment was NOT randomized, inverse-propensity
weighting recovers the average treatment effect under unconfoundedness
(Rosenbaum & Rubin 1983; Horvitz-Thompson / Hajek estimators).

Everything follows the module's GD-trainer determinism recipe
(plans/survival.cox_ph, llm/classifier trainers): floor grids only,
per-term round(9)->DECIMAL(38,9) sums (order-free), string-hop
decimal->double re-entry, transcendentals (exp) floor-quantized on the
coarse 1e-6 grid behind an eta clip — so the whole fit unrolls to
hash-exact SQL for the DuckDB oracle.

Scale (100 TB): the trainer is fixed-iteration full-batch GD — each
step is ONE data scan into a 1-row gradient reduce plus a broadcast
join against the 1-row beta frame; nothing data-sized ever sits on the
driver.  The IPW readout is one more scan with quantized weight sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbt_fusion_spark.plans.stats import D389, _d2d, _qterm

ETA_CLIP = 30.0


def _f9(c):
    return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _f6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _sigmoid(eta):
    """Quantized logistic link: eta clipped to +-ETA_CLIP (keeps the
    1e-6 exp grid exact — floor of an inexact giant double could
    differ by engine), exp floor-quantized at 1e-6."""
    ec = F.greatest(F.least(eta, F.lit(ETA_CLIP)), F.lit(-ETA_CLIP))
    return F.lit(1.0) / (F.lit(1.0) + _f6(F.exp(-ec)))


def _eta(feature_cols: list[str], prefix: str = "b",
         xprefix: str = "x") -> "F.Column":
    """b0 + sum_i f9(x_i * b_i) — the cox_ph eta convention (b0 is
    already on the 1e-9 grid from the update)."""
    eta = F.col(f"{prefix}0")
    for i in range(1, len(feature_cols) + 1):
        eta = eta + _f9(F.col(f"{xprefix}{i}") * F.col(f"{prefix}{i}"))
    return eta


def train_logistic_tabular(df: DataFrame, label_col: str,
                           feature_cols: list[str], iters: int = 8,
                           lr: float = 1.0) -> DataFrame:
    """Full-batch gradient-descent logistic regression on TABULAR
    features (the text trainers hash grams; this one takes numeric
    columns directly — the propensity-model workhorse):

        b <- b + f9(lr * mean((y - sigma(eta)) x))      per feature
        eta = b0 + sum f9(x_i b_i),  sigma quantized (1e-6 grid)

    Returns ONE wide row (b0, b1..bp) — broadcastable straight into
    logistic_scores.  Rows with any NULL label/feature are dropped
    (casewise deletion).  Callers should put features on a moderate
    scale (e.g. f9(ln(1+count))) — raw heavy-tailed counts make plain
    GD step sizes useless, same as any unscaled GD.

    Scale: per iteration one scan + 1-row reduce + broadcast beta
    join; beta localCheckpoints so plan depth stays constant.
    """
    p = len(feature_cols)
    if p < 1:
        raise ValueError("need at least one feature")
    spark = df.sparkSession
    xs = [F.col(c).cast("double").alias(f"x{i + 1}")
          for i, c in enumerate(feature_cols)]
    data = (df.select(F.col(label_col).cast("double").alias("y"), *xs)
            .na.drop()
            .persist())
    n = data.count()
    if n == 0:
        raise ValueError("no complete rows to fit on")
    beta = spark.createDataFrame(
        [tuple(0.0 for _ in range(p + 1))],
        ", ".join(f"b{i} double" for i in range(p + 1))) \
        .localCheckpoint(eager=True)
    for _ in range(iters):
        s = data.withColumn(
            "__k", F.pmod(F.abs(F.xxhash64("y")), F.lit(1))) \
            .join(F.broadcast(beta.withColumn(
                "__k", F.pmod(F.abs(F.xxhash64("b0")), F.lit(1)))),
                "__k")
        resid = F.col("y") - _sigmoid(_eta(feature_cols))
        aggs = [F.sum(_qterm(resid)).alias("g0")]
        for i in range(1, p + 1):
            aggs.append(F.sum(_qterm(resid * F.col(f"x{i}")))
                        .alias(f"g{i}"))
        g = s.agg(*aggs)
        upd = beta.withColumn(
            "__k", F.pmod(F.abs(F.xxhash64("b0")), F.lit(1))) \
            .join(F.broadcast(g.withColumn(
                "__k", F.pmod(F.abs(F.xxhash64("g0")), F.lit(1)))),
                "__k")
        beta = upd.select(*[
            _f9(F.col(f"b{i}")
                + F.lit(lr) * _d2d(f"g{i}") / F.lit(float(n)))
            .alias(f"b{i}") for i in range(p + 1)]) \
            .localCheckpoint(eager=True)
    data.unpersist()
    return beta


def logistic_scores(df: DataFrame, weights: DataFrame,
                    feature_cols: list[str]) -> DataFrame:
    """Attach the fitted propensity sigma(eta) as column `propensity`
    (quantized exactly as in training, so served scores are
    bit-comparable).  One broadcast join against the 1-row weights."""
    # private __fx aliases: callers may legitimately name their own
    # features x1..xp (the demo does), which would collide
    xs = [F.col(c).cast("double").alias(f"__fx{i + 1}")
          for i, c in enumerate(feature_cols)]
    # opaque COMPUTED key (never a literal): a constant-foldable key
    # degrades the broadcast hash join to a BNLJ (the kappa bug)
    s = (df.select("*", *xs)
         .withColumn("__k", F.pmod(F.abs(F.coalesce(
             F.xxhash64("__fx1"), F.lit(1))), F.lit(1)))
         .join(F.broadcast(weights.withColumn(
             "__k", F.pmod(F.abs(F.xxhash64("b0")), F.lit(1)))),
             "__k"))
    out = s.withColumn(
        "propensity",
        _f6(_sigmoid(_eta(feature_cols, xprefix="__fx"))))
    drop = (["__k"]
            + [f"__fx{i}" for i in range(1, len(feature_cols) + 1)]
            + [f"b{i}" for i in range(len(feature_cols) + 1)])
    return out.drop(*drop)


def ipw_ate(df: DataFrame, treat_col: str, outcome_col: str,
            confounder_cols: list[str], iters: int = 8,
            lr: float = 1.0, clip: float = 0.01) -> DataFrame:
    """Average treatment effect by stabilized inverse-propensity
    weighting (the Hajek estimator):

        e(x)  = P(T=1 | x)            (train_logistic_tabular fit)
        ATE   = sum(T y / e) / sum(T / e)
              - sum((1-T) y / (1-e)) / sum((1-T) / (1-e))

    with e clipped to [clip, 1-clip] (standard positivity trimming —
    an unclipped e near 0/1 hands one row the whole estimate).

    Emits ONE row: n, n_treated, naive_diff (the confounded raw gap),
    ate_ipw, and mean_propensity_treated/control (the overlap
    diagnostic worth eyeballing before trusting the number).

    Scale: the trainer's fixed scans + ONE weighted-sum scan; weight
    terms ride round(9)->DECIMAL sums.
    """
    data = df.select(
        F.col(treat_col).cast("double").alias("t"),
        F.col(outcome_col).cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in confounder_cols]) \
        .na.drop()
    w = train_logistic_tabular(data, "t", confounder_cols,
                               iters=iters, lr=lr)
    scored = logistic_scores(data, w, confounder_cols)
    e = F.greatest(F.least(F.col("propensity"),
                           F.lit(1.0 - clip)), F.lit(clip))
    t = F.col("t")
    y = F.col("y")
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(t).cast("bigint").alias("n_treated"),
        F.sum(_qterm(t / e)).alias("__w1"),
        F.sum(_qterm(t * y / e)).alias("__wy1"),
        F.sum(_qterm((1 - t) / (1 - e))).alias("__w0"),
        F.sum(_qterm((1 - t) * y / (1 - e))).alias("__wy0"),
        F.sum(_qterm(t * y)).alias("__sy1"),
        F.sum(_qterm((1 - t) * y)).alias("__sy0"),
        F.sum(_qterm(t * e)).alias("__se1"),
        F.sum(_qterm((1 - t) * e)).alias("__se0"))
    n1 = F.col("n_treated").cast("double")
    n0 = (F.col("n") - F.col("n_treated")).cast("double")
    ok = (F.col("n_treated") > 0) & (F.col("n") > F.col("n_treated"))
    naive = F.when(ok, _d2d("__sy1") / n1 - _d2d("__sy0") / n0)
    ate = F.when(ok, _d2d("__wy1") / _d2d("__w1")
                 - _d2d("__wy0") / _d2d("__w0"))
    return agg.select(
        "n", "n_treated",
        F.round(naive, 6).alias("naive_diff"),
        F.round(ate, 6).alias("ate_ipw"),
        F.round(F.when(ok, _d2d("__se1") / n1), 6)
         .alias("mean_propensity_treated"),
        F.round(F.when(ok, _d2d("__se0") / n0), 6)
         .alias("mean_propensity_control"))
