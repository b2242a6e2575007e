"""Gate queries for the custom relational operators Spark lacks:
as-of join, keyless range join, KMV distinct sketch.

Each oracle uses DuckDB's NATIVE implementation of the operator (ASOF
JOIN, IEJoin inequality join) — the strongest available check: our
composed-DataFrame implementations must reproduce a dedicated engine's
semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.llm import sketch as K
from dbt_fusion_spark.plans.asof_join import asof_join
from dbt_fusion_spark.plans.range_join import bucketed_range_join
from dbt_fusion_spark.sources.registry import load_table


@register(
    "asof_join_last_purchase",
    oracle="""
    WITH pur AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_id,
             arg_max("value", event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN pur p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_last_purchase(spark, sf_dir):
    """Each click joined to the user's most recent purchase at-or-before
    it (NULL before the first purchase) — checked against DuckDB's
    native ASOF JOIN. One shuffle on user_id (union-of-streams plan,
    plans/asof_join.py), vs the inequality-join blowup."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"))
    return asof_join(clicks, purchases, "user_id",
                     left_ts="ts", right_ts="ts",
                     payload=["purchase_id", "purchase_value"], how="left")


@register(
    "range_join_incident_windows",
    oracle="""
    WITH iv AS (
      SELECT event_id AS incident_id, ts AS start_ts,
             ts + INTERVAL 1 HOUR AS end_ts
      FROM events WHERE event_type = 'error' AND "value" > 300)
    SELECT incident_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM iv JOIN events e ON e.ts >= start_ts AND e.ts < end_ts
    GROUP BY incident_id
    """,
)
def range_join_incident_windows(spark, sf_dir):
    """Keyless interval join: high-value error events open 1-hour
    windows; count ALL events landing in each window. DuckDB executes
    the inequality join natively (IEJoin); our plan quantizes time into
    1h buckets and hash-joins on the bucket (plans/range_join.py) —
    the shape that works when both sides are large."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter((F.col("event_type") == "error")
                   & (F.col("value") > 300)).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"))
    pts = ev.select(F.col("event_id").alias("pt_id"),
                    F.col("ts").alias("pt_ts"))
    joined = bucketed_range_join(pts, iv, "pt_ts", "start_ts", "end_ts",
                                 bucket_width_sec=3600)
    return joined.groupBy("incident_id").agg(
        F.count("*").alias("n_events"))


@register(
    "kmv_distinct_events",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST('0x' || substring(
               md5('42|' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
             AS h
      FROM events),
    k AS (SELECT h FROM h ORDER BY h LIMIT 1024)
    SELECT MAX(h) AS kth_min, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CASE WHEN COUNT(*) < 1024 THEN CAST(COUNT(*) AS DOUBLE)
                ELSE CAST(COUNT(*) - 1 AS DOUBLE) * 4294967296.0
                     / CAST(MAX(h) AS DOUBLE)
           END AS est_distinct
    FROM k
    """,
)
def kmv_distinct_events(spark, sf_dir):
    """KMV distinct-count sketch over event_id: engine-portable (the
    estimate is a pure function of the data — DuckDB reproduces it
    bit-for-bit, which HyperLogLog never can). TakeOrdered top-k, no
    full sort."""
    ev = load_table(spark, sf_dir, "events")
    return K.kmv_distinct_estimate(ev, "event_id", k=1024)


@register(
    "kmv_set_estimates_events",
    # union/intersection estimates of the clicker vs purchaser user
    # sets from two mergeable KMV sketches (k=256): the oracle restates
    # the identical hash-top-k algebra, so the ESTIMATES match
    # bit-for-bit even though they are approximations.
    oracle="""
    WITH ha AS (
      SELECT DISTINCT CAST('0x' || substring(
               md5('42|' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
             AS h
      FROM events WHERE event_type = 'click'),
    hb AS (
      SELECT DISTINCT CAST('0x' || substring(
               md5('42|' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
             AS h
      FROM events WHERE event_type = 'purchase'),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
    uk AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
           ORDER BY h LIMIT 256),
    marked AS (
      SELECT uk.h,
             CASE WHEN ka.h IS NOT NULL AND kb.h IS NOT NULL
                  THEN 1 ELSE 0 END AS in_both
      FROM uk LEFT JOIN ka ON uk.h = ka.h LEFT JOIN kb ON uk.h = kb.h),
    agg AS (SELECT MAX(h) AS kth_min, COUNT(*) AS n_kept,
                   SUM(in_both) AS n_both FROM marked),
    est AS (
      SELECT CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                  ELSE CAST(n_kept - 1 AS DOUBLE) * 4294967296.0
                       / CAST(kth_min AS DOUBLE) END AS eu,
             CAST(n_both AS DOUBLE) / CAST(n_kept AS DOUBLE) AS rho
      FROM agg)
    SELECT CAST(round(eu, 6) AS DOUBLE) AS est_union,
           CAST(round(rho * eu, 6) AS DOUBLE) AS est_intersection,
           CAST(round(rho, 9) AS DOUBLE) AS jaccard
    FROM est
    """,
)
def kmv_set_estimates_events(spark, sf_dir):
    """Mergeable-sketch set algebra: KMV sketches of the clicker and
    purchaser user sets combine (union-the-hashes, keep k smallest)
    into union/intersection distinct estimates — the fleet pattern of
    sketch-per-shard-then-merge, reproducible on any engine with md5."""
    ev = load_table(spark, sf_dir, "events")
    a = K.kmv_sketch(ev.filter(F.col("event_type") == "click"),
                     "user_id", k=256)
    b = K.kmv_sketch(ev.filter(F.col("event_type") == "purchase"),
                     "user_id", k=256)
    return K.kmv_set_estimates(a, b, k=256)


@register(
    "events_gapfill_locf",
    # sparse per-user daily purchase totals -> complete daily spine per
    # user with last-observation-carried-forward fill
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS spend
      FROM events
      WHERE event_type = 'purchase' AND user_id % 7 = 0
      GROUP BY user_id, date_trunc('day', ts)),
    bounds AS (
      SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      FROM daily GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi,
                                             INTERVAL 1 DAY)) AS day
      FROM bounds),
    joined AS (
      SELECT s.user_id, s.day, d.spend
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, day,
           last_value(spend IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spend,
           spend IS NULL AS is_gap
    FROM joined
    """,
)
def events_gapfill_locf(spark, sf_dir):
    """Hypertable-style gap filling: per-user daily purchase series
    completed over each user's own span (sequence+explode spine, no
    global calendar cross join), LOCF via a key-partitioned running
    window — the time_bucket_gapfill primitive Spark lacks."""
    from dbt_fusion_spark.plans.timeseries import gapfill

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0))
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)"))
          .cast("double").alias("spend"))
    return gapfill(daily, "user_id", "day", "spend",
                   step="1 day", method="locf")


@register(
    "skew_report_lineitem_suppkey",
    oracle="""
    WITH counted AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key_value,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_suppkey),
    total AS (SELECT SUM(n_rows) AS t FROM counted),
    top AS (SELECT key_value, n_rows FROM counted
            ORDER BY n_rows DESC, key_value LIMIT 10)
    SELECT key_value, n_rows,
           CAST(round(n_rows / CAST(t AS DOUBLE), 9) AS DOUBLE)
             AS frac_of_total,
           CAST(row_number() OVER (ORDER BY n_rows DESC, key_value)
                AS INT) AS rank
    FROM top CROSS JOIN total
    """,
)
def skew_report_lineitem_suppkey(spark, sf_dir):
    """Shuffle-skew diagnosis of a prospective join key: the 10
    heaviest l_suppkey values with their share of all lineitem rows —
    the report that decides between plain, salted, and broadcast joins.
    One groupBy + TakeOrdered; the global rank window covers only the
    10 surviving rows."""
    from dbt_fusion_spark.plans.skew import skew_report

    li = load_table(spark, sf_dir, "lineitem")
    return skew_report(li, "l_suppkey", top_k=10)


# ---------------------------------------------------------------- profiling

_PROFILE_COLS = [
    # (name, kind) — kind drives the min/max canonicalization on BOTH
    # engines (doubles via DECIMAL(38,9): IEEE doubles print
    # differently per engine, decimals identically; timestamps via an
    # explicit microsecond format)
    ("event_id", "plain"),
    ("ts", "ts"),
    ("user_id", "plain"),
    ("event_type", "plain"),
    ("value", "float"),
    ("props", "plain"),
]


def _profile_oracle() -> str:
    parts = []
    for name, kind in _PROFILE_COLS:
        if kind == "float":
            mn = f"CAST(min(CAST({name} AS DECIMAL(38,9))) AS VARCHAR)"
            mx = f"CAST(max(CAST({name} AS DECIMAL(38,9))) AS VARCHAR)"
        elif kind == "ts":
            mn = f"strftime(min({name}), '%Y-%m-%d %H:%M:%S.%f')"
            mx = f"strftime(max({name}), '%Y-%m-%d %H:%M:%S.%f')"
        else:
            mn = f"CAST(min({name}) AS VARCHAR)"
            mx = f"CAST(max({name}) AS VARCHAR)"
        parts.append(f"""
    SELECT '{name}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
           {mn} AS min_value, {mx} AS max_value
    FROM events""")
    return "\nUNION ALL\n".join(parts)


@register("profile_table_events", oracle=_profile_oracle())
def profile_table_events(spark, sf_dir):
    """Exact one-pass table profile (plans/profile.py): per-column
    n_rows / n_nulls / exact NDV / canonicalized min-max over events.
    All COUNT(DISTINCT)s collapse into one Expand feeding a single
    shuffle — one scan regardless of column count."""
    from dbt_fusion_spark.plans.profile import profile_table

    ev = load_table(spark, sf_dir, "events")
    return profile_table(ev, [c for c, _ in _PROFILE_COLS])


# ------------------------------------------------------------- attribution

@register(
    "events_attribution_models",
    # Same join + per-conversion window algebra restated for DuckDB.
    # Per-row credits are IEEE-identical across engines (same operands,
    # same ops); the SUMs go through DECIMAL(18,6) so accumulation is
    # exact and order-independent on both sides.
    oracle="""
    WITH touches AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('view', 'click')),
    convs AS (
      SELECT user_id, ts AS c_ts, event_id AS conv_id, value
      FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT t.event_type, c.conv_id, c.value,
             COUNT(*) OVER w AS n,
             ROW_NUMBER() OVER (PARTITION BY c.user_id, c.conv_id
                                ORDER BY t.ts, t.event_id) AS rk,
             pow(2.0, -((epoch_us(c.c_ts) - epoch_us(t.ts)) / 1e6)
                       / 86400.0) AS dw,
             SUM(pow(2.0, -((epoch_us(c.c_ts) - epoch_us(t.ts)) / 1e6)
                           / 86400.0)) OVER w AS dws
      FROM touches t JOIN convs c
        ON t.user_id = c.user_id AND t.ts <= c.c_ts
           AND t.ts > c.c_ts - INTERVAL 7 DAY
      WINDOW w AS (PARTITION BY c.user_id, c.conv_id))
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touch_rows,
      CAST(SUM(CAST(CASE WHEN rk = 1 THEN value ELSE 0 END
               AS DECIMAL(18,6))) AS DOUBLE) AS credit_first_touch,
      CAST(SUM(CAST(CASE WHEN rk = n THEN value ELSE 0 END
               AS DECIMAL(18,6))) AS DOUBLE) AS credit_last_touch,
      CAST(SUM(CAST(value / n AS DECIMAL(18,6))) AS DOUBLE)
        AS credit_linear,
      CAST(SUM(CAST(CASE WHEN n = 1 THEN value
                         WHEN n = 2 THEN value * 0.5
                         WHEN rk = 1 THEN value * 0.4
                         WHEN rk = n THEN value * 0.4
                         ELSE value * 0.2 / (n - 2) END
               AS DECIMAL(18,6))) AS DOUBLE) AS credit_position_based,
      CAST(SUM(CAST(value * dw / dws AS DECIMAL(18,6))) AS DOUBLE)
        AS credit_time_decay
    FROM j GROUP BY event_type
    """,
)
def events_attribution_models(spark, sf_dir):
    """Multi-touch attribution (plans/attribution.py): purchases
    credited to preceding view/click touches within a 7-day lookback
    under first/last/linear/position-based/time-decay models, rolled up by touch
    channel. One user-keyed equi-join + per-conversion windows — no
    range-join blowup, no global sort."""
    from dbt_fusion_spark.plans.attribution import attribute_conversions

    ev = load_table(spark, sf_dir, "events")
    touches = (ev.filter(F.col("event_type").isin("view", "click"))
                 .select("user_id", "ts", "event_id", "event_type"))
    convs = (ev.filter(F.col("event_type") == "purchase")
               .select("user_id", "ts",
                       F.col("event_id").alias("conv_id"), "value"))
    credits = attribute_conversions(
        touches, convs, "user_id", "ts", "event_id", "conv_id", "value",
        lookback="7 days")

    def dsum(c):
        return F.sum(F.col(c).cast("decimal(18,6)")).cast("double")

    return credits.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touch_rows"),
        dsum("credit_first_touch").alias("credit_first_touch"),
        dsum("credit_last_touch").alias("credit_last_touch"),
        dsum("credit_linear").alias("credit_linear"),
        dsum("credit_position_based").alias("credit_position_based"),
        dsum("credit_time_decay").alias("credit_time_decay"),
    )


# -------------------------------------------------------- volume anomalies

@register(
    "events_volume_anomaly",
    # gap-filled per-type daily volumes, trailing 7-bucket baseline
    # (current excluded), z-scores rounded to 6 — the window holds <=7
    # exactly-integer counts, so cross-engine drift is far below 1e-6
    oracle="""
    WITH counts AS (
      SELECT event_type, date_trunc('day', ts) AS bucket,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM counts GROUP BY event_type),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM bounds),
    filled AS (
      SELECT s.event_type, s.bucket, COALESCE(c.n, 0) AS n_rows
      FROM spine s LEFT JOIN counts c
        ON s.event_type = c.event_type AND s.bucket = c.bucket),
    stats AS (
      SELECT event_type, bucket, n_rows,
             AVG(n_rows) OVER w AS mu,
             STDDEV_SAMP(n_rows) OVER w AS sd,
             COUNT(*) OVER w AS nw
      FROM filled
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, bucket, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(round(mu, 6) AS DOUBLE) AS baseline_mean,
           CAST(round(sd, 6) AS DOUBLE) AS baseline_stddev,
           CAST(round(CASE WHEN nw >= 3 AND sd > 0
                           THEN (n_rows - mu) / sd END, 6) AS DOUBLE) AS z,
           COALESCE(abs(CASE WHEN nw >= 3 AND sd > 0
                             THEN (n_rows - mu) / sd END) > 3.0, FALSE)
           OR COALESCE(nw >= 3 AND sd = 0 AND n_rows <> mu, FALSE)
             AS is_anomaly
    FROM stats
    """,
)
def events_volume_anomaly(spark, sf_dir):
    """Data-observability volume check (plans/anomaly.py): per-type
    daily row counts gap-filled to a complete spine (a missing day is
    the anomaly you most want), trailing z-score vs the previous 7
    buckets. The window math runs on the tiny rollup, never raw events."""
    from dbt_fusion_spark.plans.anomaly import volume_anomalies

    ev = load_table(spark, sf_dir, "events")
    return volume_anomalies(ev, "event_type", "ts", step="1 day",
                            window=7, min_periods=3, z_thresh=3.0)


# ---------------------------------------------------------------- pagerank

def _pagerank_oracle(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank for DuckDB — same algebra as
    plans/pagerank.py (including the dangling CTE, identically zero on
    this symmetric graph), one CTE trio per iteration."""
    parts = [f"""
    WITH eraw AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1997-01-01'
      GROUP BY o_custkey, l_suppkey),
    edges AS (SELECT src, dst, w FROM eraw
              UNION ALL SELECT dst AS src, src AS dst, w FROM eraw),
    nodes0 AS (SELECT DISTINCT src AS node FROM edges
               UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes0),
    nodes AS (SELECT node, n FROM nodes0 CROSS JOIN nn),
    outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
    enorm AS (SELECT e.src, e.dst, e.w / o.outw AS p
              FROM edges e JOIN outw o ON e.src = o.src),
    r0 AS (SELECT node, n, 1.0 / n AS rank FROM nodes)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
    d{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS dm
             FROM r{i - 1} r LEFT JOIN outw o ON r.node = o.src
             WHERE o.src IS NULL),
    c{i} AS (SELECT e.dst, SUM(r.rank * e.p) AS c
             FROM enorm e JOIN r{i - 1} r ON e.src = r.node
             GROUP BY e.dst),
    r{i} AS (SELECT nd.node, nd.n,
                    (1 - {d}) / nd.n
                    + {d} * (COALESCE(c.c, 0) + d{i}.dm / nd.n) AS rank
             FROM nodes nd LEFT JOIN c{i} c ON nd.node = c.dst
             CROSS JOIN d{i})""")
    parts.append(f"""
    SELECT node, CAST(round(rank, 9) AS DOUBLE) AS rank FROM r{n_iter}""")
    return "".join(parts)


@register("graph_pagerank_suppliers", oracle=_pagerank_oracle())
def graph_pagerank_suppliers(spark, sf_dir):
    """Weighted PageRank (plans/pagerank.py) over the symmetric
    1996 customer<->supplier transaction graph (edge weight =
    lineitems traded; the order-year filter is pushed to the scan),
    5 power iterations with damping 0.85. Two edge-sized
    shuffles per iteration, scalars on 1-row broadcast joins, lineage
    cut by localCheckpoint — the iterative-graph pattern shared with
    connected components."""
    from dbt_fusion_spark.plans.pagerank import pagerank

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    # bigint node ids (cust*2 / supp*2+1): node ids flow through every
    # iteration's shuffles — 8-byte keys, not strings, at fleet scale
    eraw = (orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_custkey", "l_suppkey")
            .agg(F.count(F.lit(1)).cast("double").alias("w"))
            .select((F.col("o_custkey") * 2).alias("src"),
                    (F.col("l_suppkey") * 2 + 1).alias("dst"), "w"))
    edges = eraw.unionByName(
        eraw.select(F.col("dst").alias("src"),
                    F.col("src").alias("dst"), "w"))
    pr = pagerank(edges, "src", "dst", weight_col="w",
                  damping=0.85, n_iter=5)
    return pr.select("node", F.round("rank", 9).alias("rank"))


# -------------------------------------------------------- rolling actives

@register(
    "events_rolling_active_7d",
    # the oracle is the NAIVE distinct-over-window formulation (DuckDB
    # executes the quadratic join fine at oracle scale); the engine
    # side is the sweep-line plan that replaces it at 100 TB
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ud),
    days AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds)
    SELECT CAST(dd.day AS DATE) AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_active
    FROM days dd LEFT JOIN ud u
      ON u.d BETWEEN CAST(dd.day AS DATE) - 6 AND CAST(dd.day AS DATE)
    GROUP BY dd.day
    """,
)
def events_rolling_active_7d(spark, sf_dir):
    """Exact trailing-7-day active users per calendar day WITHOUT
    distinct-over-window (plans/activity.py): per-user coverage
    intervals via one lead() window -> +1/-1 deltas -> running sum over
    the day spine. Two bounded shuffles; the only global window runs
    over one row per day."""
    from dbt_fusion_spark.plans.activity import rolling_active_users

    ev = load_table(spark, sf_dir, "events")
    return rolling_active_users(ev, "user_id", "ts", window_days=7)


# --------------------------------------------------------------------- twap

@register(
    "events_twap_user_value",
    # time-weighted average purchase value per (user, day): each sample
    # holds until the next, the last until midnight; durations are
    # exact integer microseconds and the weighted sums accumulate in
    # DECIMAL, so both engines emit identical doubles
    oracle="""
    WITH s AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
               AS bucket, value,
             epoch_us(ts) AS t,
             epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) AS e
      FROM events WHERE event_type = 'purchase' AND user_id % 11 = 0),
    d AS (
      SELECT user_id, bucket, value,
             COALESCE(LEAD(t) OVER (PARTITION BY user_id, bucket
                                    ORDER BY t), e) - t AS dur
      FROM s)
    SELECT user_id, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(round(CAST(SUM(CAST(value * dur AS DECIMAL(28,6)))
                           / SUM(CAST(dur AS DECIMAL(28,6)))
                      AS DOUBLE), 6) AS DOUBLE) AS twap
    FROM d GROUP BY user_id, bucket
    """,
)
def events_twap_user_value(spark, sf_dir):
    """TWAP (plans/timeseries.py time_weighted_average): per-user daily
    time-weighted purchase value over irregular ticks — one keyed
    lead() window + one aggregate on the same hash exchange. A plain
    AVG is wrong exactly when sampling is bursty."""
    from dbt_fusion_spark.plans.timeseries import time_weighted_average

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 11 == 0))
    return time_weighted_average(ev, "user_id", "ts", "value",
                                 bucket="day")


def _duck_list_median(lst: str) -> str:
    """Interpolated median of a DuckDB list expression (list_median
    truncates even counts to the lower middle; engine side averages)."""
    return (f"(CASE WHEN len({lst}) % 2 = 1 "
            f"THEN list_sort({lst})[(len({lst}) + 1) // 2] "
            f"ELSE (list_sort({lst})[len({lst}) // 2] "
            f"      + list_sort({lst})[len({lst}) // 2 + 1]) / 2.0 END)")


_ROBUST_MED = _duck_list_median("l")
_ROBUST_MAD = _duck_list_median("list_transform(l, x -> abs(x - med))")

@register(
    "events_volume_anomaly_robust",
    # median/MAD variant: the baseline list is materialized per row
    # (bounded <= 7 by the frame) and medians computed by sort+index —
    # exactly the engine's array-HOF algebra, restated for DuckDB
    oracle=f"""
    WITH counts AS (
      SELECT event_type, date_trunc('day', ts) AS bucket,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM counts GROUP BY event_type),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM bounds),
    filled AS (
      SELECT s.event_type, s.bucket, COALESCE(c.n, 0) AS n_rows
      FROM spine s LEFT JOIN counts c
        ON s.event_type = c.event_type AND s.bucket = c.bucket),
    lists AS (
      SELECT event_type, bucket, n_rows,
             COALESCE(list(n_rows) OVER w, []) AS l
      FROM filled
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
    meds AS (
      SELECT event_type, bucket, n_rows, l,
             CAST({_ROBUST_MED} AS DOUBLE) AS med
      FROM lists),
    mads AS (
      SELECT event_type, bucket, n_rows, len(l) AS nw, med,
             CAST({_ROBUST_MAD} AS DOUBLE) AS mad
      FROM meds)
    SELECT event_type, bucket, CAST(n_rows AS BIGINT) AS n_rows,
           med AS baseline_mean,
           mad AS baseline_stddev,
           CAST(CASE WHEN nw >= 3 AND mad > 0
                     THEN 0.6745 * (n_rows - med) / mad END
                AS DOUBLE) AS z,
           COALESCE(abs(CASE WHEN nw >= 3 AND mad > 0
                             THEN 0.6745 * (n_rows - med) / mad END)
                    > 3.0, FALSE)
           OR COALESCE(nw >= 3 AND mad = 0 AND n_rows <> med, FALSE)
             AS is_anomaly
    FROM mads
    """,
)
def events_volume_anomaly_robust(spark, sf_dir):
    """Robust (median/MAD) volume anomalies (plans/anomaly.py
    method='robust'): immune to baseline-spike masking; the trailing
    baseline is a bounded array per row, medians via array HOFs — no
    extra shuffle over the plain-z variant."""
    from dbt_fusion_spark.plans.anomaly import volume_anomalies

    ev = load_table(spark, sf_dir, "events")
    return volume_anomalies(ev, "event_type", "ts", step="1 day",
                            window=7, min_periods=3, z_thresh=3.0,
                            method="robust")


@register(
    "sketch_ddsketch_quantiles",
    # DDSketch (Masson 2019): the bucket histogram is a pure function
    # of the data (unlike percentile_approx's engine-private GK
    # sketch), so the ESTIMATES reproduce bit-for-bit on DuckDB. The
    # ln(gamma) divisor is passed as the same Python-computed literal
    # to both engines.
    oracle="""
    WITH s AS (
      SELECT CASE WHEN value = 0 THEN -4611686018427387904
                  ELSE CAST(ceil(ln(value) / 0.020000666706669435) AS BIGINT) END AS bucket
      FROM events WHERE value >= 0),
    h AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
          FROM s GROUP BY bucket),
    c AS (SELECT bucket, n,
                 SUM(n) OVER (ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(n) OVER () AS total
          FROM h),
    qv AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS q),
    hit AS (SELECT q, MIN(bucket) AS b
            FROM c JOIN qv ON TRUE
            WHERE cum >= ceil(q * (total - 1)) + 1 GROUP BY q)
    SELECT q, CAST(round(CASE WHEN b = -4611686018427387904 THEN 0.0
                              ELSE 2 * pow(1.02020202020202, b) / 2.02020202020202
                         END, 6) AS DOUBLE) AS est
    FROM hit ORDER BY q
""",
)
def sketch_ddsketch_quantiles(spark, sf_dir):
    """Mergeable relative-error quantiles at 100 TB: DDSketch histogram
    (one map-side-combined groupBy, output bounded by
    log(max/min)/log(gamma) buckets regardless of input size) walked
    for p50/p95/p99 of event values; alpha=1% relative error."""
    from dbt_fusion_spark.llm.sketch import ddsketch, ddsketch_quantiles

    ev = load_table(spark, sf_dir, "events")
    sk = ddsketch(ev, "value", alpha=0.01)
    return ddsketch_quantiles(sk, [0.5, 0.95, 0.99], alpha=0.01)


@register(
    "sketch_ddsketch_by_type",
    # keyed DDSketch: p50/p95 of event value PER event_type — the
    # grouped-rollup shape; the cumulative walk window hash-partitions
    # on the key
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CASE WHEN value = 0 THEN -4611686018427387904
                  ELSE CAST(ceil(ln(value) / {__import__('math').log(101/99)!r})
                       AS BIGINT) END AS bucket
      FROM events WHERE value >= 0),
    h AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
          FROM s GROUP BY event_type, bucket),
    c AS (SELECT event_type, bucket, n,
                 SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(n) OVER (PARTITION BY event_type) AS total
          FROM h),
    qv AS (SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q),
    hit AS (SELECT event_type, q, MIN(bucket) AS b
            FROM c JOIN qv ON TRUE
            WHERE cum >= ceil(q * (total - 1)) + 1
            GROUP BY event_type, q)
    SELECT event_type, q,
           CAST(round(CASE WHEN b = -4611686018427387904 THEN 0.0
                           ELSE 2 * pow({(101/99)!r}, b) / {(101/99)+1.0!r}
                      END, 6) AS DOUBLE) AS est
    FROM hit ORDER BY event_type, q
    """,
)
def sketch_ddsketch_by_type(spark, sf_dir):
    """Keyed DDSketch quantiles (llm/sketch.py `by=`): per-event-type
    p50/p95 from one histogram groupBy; the walk runs on the bounded
    per-key bucket tables, hash-partitioned on the key."""
    from dbt_fusion_spark.llm.sketch import ddsketch, ddsketch_quantiles

    ev = load_table(spark, sf_dir, "events")
    sk = ddsketch(ev, "value", alpha=0.01, by=["event_type"])
    return ddsketch_quantiles(sk, [0.5, 0.95], alpha=0.01,
                              by=["event_type"])


@register(
    "basket_pair_rules_lineitem",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem),
    cp AS (SELECT a.i AS item_a, b2.i AS item_b,
                  CAST(COUNT(*) AS BIGINT) AS cab
           FROM b a JOIN b b2 USING (o) WHERE a.i < b2.i
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    ci AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY i),
    ns AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM b)
    SELECT item_a, item_b, cab AS n_both,
           CAST(cab AS DOUBLE) / CAST(n AS DOUBLE) AS support,
           CAST(cab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf_a_to_b,
           CAST(cab AS DOUBLE) / CAST(cb.c AS DOUBLE) AS conf_b_to_a,
           CAST(cab AS DOUBLE) * CAST(n AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
    FROM cp
    JOIN ci ca ON ca.i = item_a
    JOIN ci cb ON cb.i = item_b
    CROSS JOIN ns
    ORDER BY lift DESC, item_a, item_b LIMIT 20
    """,
)
def basket_pair_rules_lineitem(spark, sf_dir):
    """Market-basket rules over TPC-H orders (Agrawal & Srikant 1994
    measures): top-20 part pairs by lift with support/confidence —
    order-keyed self-join of the distinct basket table (per-order work
    bounded by basket size), item supports + order count on 1-row
    scalar joins, every measure an exact integer ratio, top-k via
    TakeOrderedAndProject."""
    from dbt_fusion_spark.plans.basket import basket_pair_rules

    li = load_table(spark, sf_dir, "lineitem")
    return basket_pair_rules(li, "l_orderkey", "l_partkey",
                             min_count=2, k=20)


@register(
    "join_salted_supplier_volume",
    # result-equivalence of the skew-salted join: oracle is the PLAIN
    # join + aggregate (salting must be invisible in the result)
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_salted_supplier_volume(spark, sf_dir):
    """Skew-resistant salted equi-join certified by result equivalence:
    lineitem x supplier through salted_join (big side salted into 16
    buckets, small side replicated per salt — a hot suppkey scatters
    across 16 shuffle partitions instead of one straggler), then the
    per-nation rollup; the oracle is the plain join. Decimal-exact
    price sum (order-independent)."""
    from dbt_fusion_spark.plans.join_strategies import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    j = salted_join(li, su.withColumnRenamed("s_suppkey", "l_suppkey"),
                    on="l_suppkey", salt_buckets=16)
    return (j.groupBy("s_nationkey")
            .agg(F.count("*").cast("bigint").alias("n_lines"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_price")))


@register(
    "asof_join_next_purchase",
    # forward as-of: DuckDB native ASOF with the inequality flipped
    oracle="""
    WITH pur AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_id,
             arg_max("value", event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts),
    views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
    SELECT v.event_id, v.user_id, v.ts, p.purchase_id, p.purchase_value
    FROM views v
    ASOF LEFT JOIN pur p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def asof_join_next_purchase(spark, sf_dir):
    """Forward as-of (next-conversion semantics): each view joined to
    the user's EARLIEST purchase at-or-after it (NULL after the last
    purchase) — checked against DuckDB's native ASOF JOIN with the
    inequality flipped. Same single user-keyed merge shuffle as the
    backward row, time order reversed."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"))
    return asof_join(views, purchases, "user_id",
                     left_ts="ts", right_ts="ts",
                     payload=["purchase_id", "purchase_value"],
                     how="left", direction="forward")


@register(
    "graph_triangle_counts_coorder",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem),
    e AS (SELECT DISTINCT a.i AS a, b2.i AS b
          FROM b a JOIN b b2 USING (o) WHERE a.i < b2.i),
    w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM e e1 JOIN e e2 ON e1.b = e2.a),
    t AS (SELECT w.* FROM w JOIN e ON e.a = w.a AND e.b = w.c),
    corners AS (
      SELECT a AS vertex FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t)
    SELECT vertex, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY vertex
    """,
)
def graph_triangle_counts_coorder(spark, sf_dir):
    """Per-part triangle counts on the co-order graph (parts co-present
    in an order are connected): compact-forward counting — canonical
    low->high edges, one wedge self-join on the middle vertex (each
    triangle generated exactly once as a<b<c), one closing equi-join.
    ~1.2M edges / 1.9M triangles at sf0.1."""
    from dbt_fusion_spark.plans.triangles import triangle_counts

    b = (load_table(spark, sf_dir, "lineitem")
         .select(F.col("l_orderkey").alias("o"),
                 F.col("l_partkey").alias("i")).distinct())
    a2 = b.withColumnRenamed("i", "i2")
    edges = (b.join(a2, "o")
             .filter(F.col("i") < F.col("i2"))
             .select(F.col("i").alias("src"), F.col("i2").alias("dst")))
    # 1.2M canonical edges ~ 20 MB: broadcast them so the 49M-row
    # wedge stream joins map-side (unpersisted+shuffled draft: 15.8s;
    # persisted+broadcast: ~11s — the probe volume is the floor)
    return triangle_counts(edges, "src", "dst", broadcast_edges=True)


@register(
    "events_rfm_scores",
    oracle="""
    WITH p AS (SELECT user_id, ts, "value" FROM events
               WHERE event_type = 'purchase'),
    pu AS (SELECT user_id AS u, MAX(ts) AS last_ts,
                  CAST(COUNT(*) AS BIGINT) AS frequency,
                  CAST(floor(SUM(CAST("value" AS DECIMAL(18,6))) * 100)
                       AS BIGINT) AS monetary_cents
           FROM p GROUP BY user_id),
    nw AS (SELECT MAX(ts) AS now_ts FROM p),
    base AS (SELECT u,
                    CAST(date_diff('day', CAST(last_ts AS DATE),
                                   CAST(now_ts AS DATE)) AS BIGINT)
                      AS recency_days,
                    frequency, monetary_cents
             FROM pu CROSS JOIN nw),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    rc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (
             SELECT recency_days AS v, COUNT(*) AS c FROM base
             GROUP BY 1)),
    rs AS (SELECT b.u,
                  CAST(6 - ((5 * cum + n - 1) // n) AS INT) AS r_score
           FROM base b JOIN rc ON rc.v = b.recency_days CROSS JOIN n),
    fc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (
             SELECT frequency AS v, COUNT(*) AS c FROM base GROUP BY 1)),
    fs AS (SELECT b.u,
                  CAST((5 * cum + n - 1) // n AS INT) AS f_score
           FROM base b JOIN fc ON fc.v = b.frequency CROSS JOIN n),
    mc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (
             SELECT monetary_cents AS v, COUNT(*) AS c FROM base
             GROUP BY 1)),
    ms AS (SELECT b.u,
                  CAST((5 * cum + n - 1) // n AS INT) AS m_score
           FROM base b JOIN mc ON mc.v = b.monetary_cents CROSS JOIN n)
    SELECT b.u AS user_id, b.recency_days, b.frequency, b.monetary_cents,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
    FROM base b
    JOIN rs ON rs.u = b.u
    JOIN fs ON fs.u = b.u
    JOIN ms ON ms.u = b.u
    """,
)
def events_rfm_scores(spark, sf_dir):
    """RFM quintile scoring over purchase events: exact integer grids
    (days / counts / floored cents — floor is midpoint-free), each
    quintile's cumulative walk windows over the bounded value-grid
    distribution table, never the user population; scores are pure
    integer arithmetic ceil(5*cume/n)."""
    from dbt_fusion_spark.plans.activity import rfm_scores

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    return rfm_scores(ev, "user_id", "ts", "value")


@register(
    "asof_join_tolerance",
    # DuckDB's native ASOF JOIN finds the last purchase; the tolerance
    # is a post-match null-out (a match older than 30 days is NO
    # match) — exactly the operator's semantics.
    oracle="""
    WITH pur AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_id,
             arg_max("value", event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN p.ts >= c.ts - INTERVAL 30 DAY
                THEN p.purchase_id END AS purchase_id,
           CASE WHEN p.ts >= c.ts - INTERVAL 30 DAY
                THEN p.purchase_value END AS purchase_value
    FROM clicks c
    ASOF LEFT JOIN pur p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_tolerance(spark, sf_dir):
    """Tolerance as-of join (r8, pandas merge_asof semantics): each
    click joined to the user's most recent purchase at-or-before it,
    but only within a 30-day attribution window — older matches are
    nulled out by a post-match projection (one shuffle total, no
    second join). Checked against DuckDB's native ASOF JOIN plus the
    same null-out."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"))
    return asof_join(clicks, purchases, "user_id",
                     left_ts="ts", right_ts="ts",
                     payload=["purchase_id", "purchase_value"],
                     how="left", tolerance="INTERVAL 30 DAYS")


@register(
    "events_funnel_sequential",
    # sequential min-chain per step; counts assemble on the k-row
    # step table with lag/first windows.
    oracle="""
    WITH base AS (
      SELECT user_id AS u, event_type AS et, ts FROM events
      WHERE ts IS NOT NULL),
    s1 AS (SELECT u, min(ts) AS t1 FROM base
           WHERE et = 'view' GROUP BY u),
    s2 AS (SELECT b.u, min(b.ts) AS t2 FROM base b JOIN s1 USING (u)
           WHERE b.et = 'click' AND b.ts >= t1 GROUP BY b.u),
    s3 AS (SELECT b.u, min(b.ts) AS t3 FROM base b JOIN s2 USING (u)
           WHERE b.et = 'purchase' AND b.ts >= t2 GROUP BY b.u),
    tbl AS (
      SELECT 1 AS step, 'view' AS step_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n
      UNION ALL
      SELECT 2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3))
    SELECT step, step_name, n AS n_users,
      round(CASE WHEN lag(n) OVER (ORDER BY step) IS NULL THEN 1.0
                 WHEN lag(n) OVER (ORDER BY step) > 0
                 THEN CAST(n AS DOUBLE) / lag(n) OVER (ORDER BY step)
            END, 6) AS conversion_from_prev,
      round(CASE WHEN first_value(n) OVER (ORDER BY step
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) > 0
                 THEN CAST(n AS DOUBLE)
                      / first_value(n) OVER (ORDER BY step
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
            END, 6) AS conversion_from_first
    FROM tbl
    """,
)
def events_funnel_sequential(spark, sf_dir):
    """Strictly-ordered view -> click -> purchase funnel (r11): a
    purchase only counts if it follows the user's first POST-VIEW
    click.  The r7 sibling (events_funnel_conversion) compares
    FIRST-occurrence times only, so a user whose first click preceded
    the view is dropped even when they re-clicked afterwards; this
    row applies the true sequential-scan semantics and adds
    conversion rates.  k steps = k shrinking user-keyed shuffles."""
    from dbt_fusion_spark.plans.activity import funnel_conversion

    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(ev, "user_id", "event_type", "ts",
                             ["view", "click", "purchase"])


@register(
    "events_cohort_retention_matrix",
    # first-event Monday-week cohorts; cell = distinct actives at
    # week offset k; sizes join on the bounded cohort grid.
    oracle="""
    WITH base AS (
      SELECT user_id AS u, ts FROM events WHERE ts IS NOT NULL),
    firsts AS (SELECT u, min(ts) AS t0 FROM base GROUP BY u),
    j AS (SELECT b.u, b.ts, f.t0 FROM base b JOIN firsts f USING (u)),
    cells AS (
      SELECT CAST(date_trunc('week', t0) AS DATE) AS cohort_week,
             CAST(floor(CAST(date_diff('day', CAST(t0 AS DATE),
                                       CAST(ts AS DATE)) AS DOUBLE)
                        / 7) AS BIGINT) AS week_offset,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_active
      FROM j GROUP BY 1, 2),
    sizes AS (
      SELECT CAST(date_trunc('week', t0) AS DATE) AS cohort_week,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY 1)
    SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
           round(CAST(c.n_active AS DOUBLE)
                 / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM cells c JOIN sizes s USING (cohort_week)
    """,
)
def events_cohort_retention_matrix(spark, sf_dir):
    """Weekly cohort retention triangle (r11): cell (cohort, k) = the
    SHARE of the cohort still active k weeks after their first event —
    the rate-normalized upgrade of the r7 count-only sibling
    (events_cohort_retention), adding cohort_size and retention. One
    user-keyed aggregate + join back; offsets computed on exact day
    arithmetic rather than week-truncated differences."""
    from dbt_fusion_spark.plans.activity import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")
