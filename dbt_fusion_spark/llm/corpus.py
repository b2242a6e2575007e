"""Corpus-level statistics and mixture shaping for training-data curation.

Beyond-reference extensions (SURVEY §2.11 family): operators that need
a view across the whole corpus, not just per-document columns —
document frequency (TF-IDF), global token frequency (heavy hitters),
and per-domain rebalancing. All are expressed as DataFrame aggregates
and joins so the heavy side stays distributed:

- tokenization is `split` + `explode` (Generate — no Python row path);
- every groupBy gets map-side partial aggregation for free;
- corpus-wide scalars (total docs, min domain count) ride a broadcast
  cross-join of a 1-row aggregate, never a `.collect()` round-trip;
- the rebalance filter reuses the portable md5 unit hash from
  sample/strategies.py, so the kept set is independent of physical
  placement (the 100 TB property) and exactly reproducible in any
  engine with md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window

from dbt_fusion_spark.sample.strategies import _unit_hash


def _join_scalar(df: DataFrame, left_col: str,
                 scalar: DataFrame, scalar_col: str) -> DataFrame:
    """Attach a 1-row aggregate's columns to every row of `df` via a
    broadcast hash equi-join on a constant derived key.

    A plain `crossJoin(broadcast(scalar))` plans a
    BroadcastNestedLoopJoin — bounded and safe for a 1-row side, but it
    forces the blanket plan guard (tests/test_plans.py) to whitelist
    BNLJ per query. A literal join key doesn't help: Catalyst constant-
    folds `1 = 1` to `true` and re-plans the cross join. Instead the
    key is `pmod(<non-null column>, 1)` — always 0, but opaque to the
    constant folder — so ExtractEquiJoinKeys fires and the plan is a
    BroadcastHashJoin against a 1-row hash table: identical cost, and
    the guard stays strict with zero BNLJ exceptions beyond the
    deliberate brute-force ANN cross join.

    `left_col` / `scalar_col` must be non-null columns (aggregate
    outputs like count/min qualify) — a null key would drop the row.
    """
    key = "__scalar_k"
    return (
        df.withColumn(key, F.pmod(F.col(left_col), F.lit(1)))
        .join(
            F.broadcast(
                scalar.withColumn(key, F.pmod(F.col(scalar_col), F.lit(1)))),
            key,
        )
        .drop(key)
    )


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows: lowercase, whitespace-run split, empties out.

    ensure_parallelism splits a single-row-group local scan so the
    explode runs on every core (no-op at fleet scale — r11)."""
    from dbt_fusion_spark.plans.partitioning import ensure_parallelism

    return (
        ensure_parallelism(df).select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            .alias("token"),
        )
        .filter(F.col("token") != "")
    )


def heavy_hitters(df: DataFrame, id_col: str, text_col: str,
                  k: int = 20) -> DataFrame:
    """Exact corpus-wide top-k tokens by frequency (ties break on token
    asc, so the result is deterministic).

    One shuffle: explode is pipelined into a partial count per
    partition, the final count is one hash aggregate, and top-k is a
    single-reducer sort over the *aggregated* (distinct-token-sized)
    table — never over the raw token stream.
    """
    counts = tokens(df, id_col, text_col).groupBy("token").agg(
        F.count("*").alias("n"), F.count_distinct(F.col(id_col)).alias("n_docs"))
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count in doc; idf = ln((N + 1) / (df + 1)) with N = corpus
    size, df = docs containing the term (smoothed, non-negative).

    Ranking is by the integer triple (tf desc, df asc, term asc) — the
    same ordering tf·idf induces when scores differ, but immune to
    engine ULP drift in `ln` when two terms tie; the float score is
    still emitted for consumers. Shape: token explode → (doc, term)
    count → term-level df aggregate joined back on term (shuffle on
    term, the aggregated side), window top-k partitioned by doc.
    """
    tok = tokens(df, id_col, text_col)
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("__n")).alias("nd")
    scored = _join_scalar(tf.join(dfreq, "token"), "tf", n_docs, "__n").withColumn(
        "tfidf",
        F.col("tf") * F.log((F.col("__n") + 1) / (F.col("df") + 1)),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # round(9): the ranking is ULP-immune by design, but the emitted
        # score is hash-compared raw against the oracle, and Spark vs
        # DuckDB `ln` differ by 1 ULP on some inputs. 9 decimals is far
        # beyond any analytical use and far inside the ~1e-16 drift.
        .select(id_col, "token", "tf", "df",
                F.round(F.col("tfidf"), 9).cast("double").alias("tfidf"),
                "rank")
    )


def rebalance_domains(df: DataFrame, domain_col: str, key_col: str,
                      seed: int = 42) -> DataFrame:
    """Uniform domain mixture: downsample every domain to the size of
    the smallest one (keep fraction = min_count / count(domain)),
    using the portable keyed Bernoulli so the decision is a pure
    function of (seed, key) — reproducible, placement-independent,
    and restatable as SQL for the oracle.

    The per-domain counts are a tiny aggregate (|domains| rows) joined
    back broadcast — the corpus itself is filtered in place, no
    shuffle of the big side.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__cnt"))
    floor = counts.select(F.min("__cnt").alias("__min")).alias("fl")
    frac = (
        _join_scalar(counts, "__cnt", floor, "__min")
        .select(
            domain_col,
            (F.col("__min").cast("double") / F.col("__cnt")).alias("__frac"),
        )
    )
    return (
        df.join(F.broadcast(frac), domain_col)
        .filter(
            _unit_hash([key_col], seed)
            < (F.col("__frac") * F.lit(4294967296)).cast("bigint")
        )
        .drop("__frac")
    )



def temperature_mixture(df: DataFrame, domain_col: str, key_col: str,
                        temperature: float = 2.0, seed: int = 42,
                        ) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual/multi-domain
    sampling standard, e.g. mBERT/XLM-R exponential smoothing): target
    share of domain d ∝ n_d^(1/T). T=1 keeps natural proportions, T→∞
    approaches uniform; 1<T<∞ upweights small domains without starving
    large ones. Downsample-only: per-domain keep fraction =
    target_share_d * N_total / n_d, capped at 1 (no row duplication),
    decided by the portable keyed Bernoulli — reproducible on any
    engine and restatable as SQL.

    Scale shape identical to rebalance_domains: a |domains|-row
    aggregate broadcast back; the corpus is filtered in place.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    # counts stay integer: _join_scalar's pmod key trick needs an exact
    # integer column (a double's pmod(x, 1) is its fractional part)
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__cnt"))
    # T=2 takes sqrt, which IEEE requires to be correctly rounded on
    # every engine (pow is only ~1-ulp), keeping the kept set bit-exact
    # cross-engine for the most common temperature
    w = (F.sqrt(F.col("__cnt").cast("double")) if temperature == 2.0
         else F.pow(F.col("__cnt").cast("double"),
                    F.lit(1.0 / temperature)))
    weighted = counts.withColumn("__w", w)
    tot = weighted.agg(F.sum("__cnt").alias("__n"),
                       F.sum("__w").alias("__wsum"))
    frac = (
        _join_scalar(weighted, "__cnt", tot, "__n")
        .select(
            domain_col,
            F.least(
                F.lit(1.0),
                (F.col("__w") / F.col("__wsum"))
                * F.col("__n").cast("double") / F.col("__cnt"),
            ).alias("__frac"),
        )
    )
    return (
        df.join(F.broadcast(frac), domain_col)
        .filter(
            _unit_hash([key_col], seed)
            < (F.col("__frac") * F.lit(4294967296)).cast("bigint")
        )
        .drop("__frac")
    )

def ipf_raking(df: DataFrame, row_col: str, col_col: str,
               iters: int = 6) -> DataFrame:
    """Iterative proportional fitting (raking, Deming-Stephan 1940)
    over the (row x col) label grid — the TWO-margin generalization of
    rebalance_domains: find per-cell weights whose ROW margins and COL
    margins are both uniform, e.g. balance a corpus to equal source
    shares AND equal language shares simultaneously (one-margin
    resampling cannot do both).  `iters` alternating proportional
    scalings of the cell shares:

        w <- f9(w * (R_r / rowsum(w)));  w <- f9(w * (C_c / colsum(w)))

    with uniform targets R = 1/|rows present|, C = 1/|cols present|.
    Emits one row per occupied cell: row, col, n, balanced_share (the
    fitted cell share) and weight_factor = share/natural-share — the
    per-row sampling/loss weight a curation pipeline applies.

    Determinism (the GD-trainer recipe): margin sums are
    round(9)->DECIMAL(38,9) of the quantized shares (order-free) with
    string-hop re-entry; every update floor-quantizes on the 1e-9
    grid, so the SQL unroll is hash-exact.

    Scale: ONE corpus-sized aggregate onto the bounded label grid;
    each iteration is two grid windows — data-size-independent.
    Arbitrary (non-uniform) target margins are the same machinery
    with a broadcast target join in place of the R/C literals.
    """
    from dbt_fusion_spark.plans.stats import _qterm

    def _f9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    grid = (df.groupBy(F.col(row_col).alias("r"),
                       F.col(col_col).alias("c"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    wfull = Window.partitionBy()
    base = grid.select(
        "r", "c", "n",
        (F.lit(1.0) / F.size(F.collect_set("r").over(wfull))
         .cast("double")).alias("tr"),
        (F.lit(1.0) / F.size(F.collect_set("c").over(wfull))
         .cast("double")).alias("tc"),
        _f9(F.col("n").cast("double")
            / F.sum("n").over(wfull).cast("double")).alias("w0"))
    cur = base.withColumn("w", F.col("w0"))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    for _ in range(iters):
        rs = F.sum(_qterm(F.col("w"))).over(wr) \
            .cast("string").cast("double")
        cur = cur.withColumn(
            "w", _f9(F.col("w") * (F.col("tr") / rs)))
        cs = F.sum(_qterm(F.col("w"))).over(wc) \
            .cast("string").cast("double")
        cur = cur.withColumn(
            "w", _f9(F.col("w") * (F.col("tc") / cs)))
    return cur.select(
        F.col("r").alias(row_col), F.col("c").alias(col_col), "n",
        F.round(F.col("w"), 6).alias("balanced_share"),
        F.round(F.col("w") / F.col("w0"), 6).alias("weight_factor"))


def upsample_epochs(df: DataFrame, domain_col: str, key_col: str,
                    epochs: dict[str, float], seed: int = 42) -> DataFrame:
    """Epoch-aware domain replication: the upsampling half of mixture
    construction (rebalance_domains / temperature_mixture are
    downsample-only). LLaMA/DoReMi-style mixtures run small
    high-quality domains for >1 epoch — e.g. wikipedia 2.5 epochs —
    which at the data layer means each doc appears floor(e) times plus
    one extra copy kept with probability frac(e).

    The fractional copy is decided by the portable keyed Bernoulli on
    (seed, key) — a pure function reproducible on any engine and stable
    under repartitioning. Emits an `epoch` column (0-based copy index)
    so downstream shuffling/packing can spread copies across shards
    rather than emitting adjacent duplicates. Domains absent from
    `epochs` default to 1.0; epochs <= 0 are rejected (drop a domain by
    filtering it out first, where the intent is visible).

    Scale shape: the epochs spec is a handful of rows broadcast onto
    the corpus; replication is a per-row `sequence` explode (no join
    against self, no shuffle) — output size is exactly
    sum_d(n_d * e_d), the training-mixture size, and the explode
    pipelines into whatever shuffle follows (packing, shard write).
    """
    bad = {d: e for d, e in epochs.items() if not e > 0}
    if bad:
        raise ValueError(f"epochs must be > 0, got {bad}")
    spark = df.sparkSession
    spec = spark.createDataFrame(
        [(d, float(e)) for d, e in sorted(epochs.items())],
        f"{domain_col} string, __e double")
    # ceil(e) >= 1 for every e > 0, so the sequence range is never
    # empty (Spark raises on 0..-1 ranges rather than returning [])
    copies = F.sequence(F.lit(0).cast("long"),
                        F.ceil("__e") - 1, F.lit(1))
    keep_rounds = F.floor("__e")
    frac_thresh = ((F.col("__e") - F.floor("__e"))
                   * F.lit(4294967296)).cast("bigint")
    return (
        df.join(F.broadcast(spec), domain_col, "left")
        .withColumn("__e", F.coalesce("__e", F.lit(1.0)))
        .withColumn("epoch", F.explode(copies))
        .filter((F.col("epoch") < keep_rounds)
                | ((F.col("epoch") == keep_rounds)
                   & (_unit_hash([key_col], seed) < frac_thresh)))
        .drop("__e")
    )


def dsir_logweights(raw: DataFrame, target: DataFrame | None, id_col: str,
                    text_col: str, n_buckets: int = 1024,
                    alpha: float = 0.5, seed: int = 42,
                    target_flag: str | None = None) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): estimate hashed
    n-gram (here: unigram) bucket distributions for the TARGET domain
    and the RAW corpus, then score every raw document by its
    log-importance ratio  sum_b tf_b * ln(p_target(b) / p_raw(b)).
    High log_weight = looks like the target domain; feed the output to
    sample_weighted for the resampling step.

    The target is given EITHER as a separate DataFrame (`target`; any
    corpus, tokenized in its own pass) OR as a boolean `target_flag`
    column on `raw` (target ⊆ raw, the common case) — the flag path
    tokenizes the corpus ONCE and derives both histograms from the same
    per-doc tf table.

    Bucketing uses the engine-portable md5 unit hash mod n_buckets, so
    weights are exactly reproducible in any engine with md5 (the 100 TB
    property: independent of partitioning and of Spark's hash seed).

    Scale shape: one bucket-keyed shuffle per corpus for the histograms
    (the raw histogram DERIVES from the per-doc tf table — single scan,
    exchange reuse); the bucket join is equi on at most n_buckets rows
    per side; corpus totals ride 1-row broadcast hash joins. The
    emitted double is rounded to 6 (sum-order ULP hygiene)."""
    def bucket(token_col):
        h = F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), token_col)), 1, 8),
            16, 10).cast("bigint")
        return F.pmod(h, F.lit(n_buckets))

    raw_toks = tokens(raw, id_col, text_col)
    tf = (raw_toks.select(id_col, bucket(F.col("token")).alias("__b"))
          .groupBy(id_col, "__b").agg(F.count("*").alias("__tf")))
    if target_flag is not None:
        # target ⊆ raw marked by a boolean column: both histograms come
        # from the SAME tf table joined to the per-doc flag — the corpus
        # is tokenized once and the tf exchange is reused (at 100 TB the
        # second full-text scan of the generic path dominates).
        flags = raw.select(id_col, F.col(target_flag).alias("__flag"))
        hist = (tf.join(flags, id_col)
                .groupBy("__b")
                .agg(F.sum("__tf").alias("__cr"),
                     F.sum(F.when(F.col("__flag"), F.col("__tf"))
                           .otherwise(F.lit(0))).alias("__ct")))
    else:
        raw_hist = tf.groupBy("__b").agg(F.sum("__tf").alias("__cr"))
        tgt_hist = (tokens(target, id_col, text_col)
                    .select(bucket(F.col("token")).alias("__b"))
                    .groupBy("__b").agg(F.count("*").alias("__ct")))
        hist = (raw_hist.join(tgt_hist, "__b", "left")
                .withColumn("__ct", F.coalesce("__ct", F.lit(0))))
    n_raw = hist.agg(F.sum("__cr").alias("__nr"))
    n_tgt = hist.agg(F.sum("__ct").alias("__nt"))
    scored = _join_scalar(tf.join(hist, "__b"), "__tf", n_raw, "__nr")
    scored = _join_scalar(scored, "__tf", n_tgt, "__nt")
    denom = F.lit(alpha) * F.lit(n_buckets)
    ratio = (F.log((F.col("__ct") + F.lit(alpha))
                   / (F.col("__nt") + denom))
             - F.log((F.col("__cr") + F.lit(alpha))
                     / (F.col("__nr") + denom)))
    return (
        scored.groupBy(id_col)
        .agg(F.sum("__tf").cast("bigint").alias("n_tokens"),
             F.round(F.sum(F.col("__tf") * ratio), 6).alias("log_weight"))
    )


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """Release-to-release corpus diff: every doc id classified as
    `added` (new only), `removed` (old only), `changed` (both sides,
    content fingerprint differs) or `unchanged`. The pre-training
    data-ops primitive behind "what moved between corpus v3 and v4" —
    feeds release notes, invalidates downstream caches for changed
    shards, and catches silent upstream regressions (a scraper that
    started truncating pages shows up as a mass of `changed`).

    Content identity is md5 of the raw text — byte-exact, engine-
    portable (the oracle restates it), and computed in codegen on each
    side BEFORE the join, so the shuffle carries (id, 32-char hash)
    instead of document bodies. One equi-join shuffle on the id; at
    fleet scale both sides hash-partition on the id and AQE handles the
    skewless merge.

    Side membership rides explicit presence flags, NOT hash nullness: a
    row with NULL text (an upstream scraper/decode failure — exactly
    the regression this op exists to catch) has a NULL fingerprint but
    IS present, and content comparison is null-safe, so NULL-vs-text is
    `changed` and NULL-vs-NULL is `unchanged`.

    Ids need NOT be unique or non-null: each side is pre-aggregated to
    one row per id — (row count, NULL-text count, md5 of the sorted
    per-row hash multiset) — so duplicate ids compare as multisets
    instead of fanning out through the join, and the join itself is
    null-safe so a NULL id is one (matchable) group per side, never a
    spurious added+removed pair. The groupBy and the join share the id
    hash-partitioning, so this costs the same single shuffle per side.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        h = F.md5(F.col(text_col))
        return df.groupBy(F.col(id_col).alias(f"__id_{tag}")).agg(
            F.count(F.lit(1)).alias(f"__n_{tag}"),
            (F.count(F.lit(1)) - F.count(h)).alias(f"__nulls_{tag}"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list(h))))
            .alias(f"__fp_{tag}"))

    o, n = side(old, "o"), side(new, "n")
    same = (F.col("__n_o").eqNullSafe(F.col("__n_n"))
            & F.col("__nulls_o").eqNullSafe(F.col("__nulls_n"))
            & F.col("__fp_o").eqNullSafe(F.col("__fp_n")))
    status = (
        F.when(F.col("__n_o").isNull(), F.lit("added"))
        .when(F.col("__n_n").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (o.join(n, F.col("__id_o").eqNullSafe(F.col("__id_n")),
                   "full_outer")
            .select(F.coalesce("__id_o", "__id_n").alias(id_col),
                    status.alias("status")))


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document lexical-diversity signals: Shannon entropy of the
    unigram distribution, type-token ratio, and counts.

    Low entropy at high length = repetitive/templated text (the cheap
    cousin of quality.repetition_signals); TTR complements it for short
    docs. H = ln(n) - (1/n) * sum_t tf*ln(tf) — computed in that form
    so a single per-doc aggregate over the tf table suffices.

    Scale shape: one tokenize scan -> one (doc, token) shuffle for tf
    -> one doc-keyed aggregate. The emitted doubles are rounded to 6
    (per-doc sum order differs across engines).
    """
    tf = (tokens(df, id_col, text_col)
          .groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    n = F.sum("tf").cast("double")
    ent = F.log(n) - F.sum(F.col("tf") * F.log("tf")) / n
    return tf.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.round(ent, 6).alias("token_entropy"),
        F.round(F.count("*") / n, 6).alias("type_token_ratio"),
    )


def pmi_topk(df: DataFrame, id_col: str, text_col: str,
             max_dist: int = 3, min_count: int = 5, k: int = 20
             ) -> DataFrame:
    """Top-k word pairs by pointwise mutual information (Church &
    Hanks 1990): co-occurrence = unordered token pairs within
    `max_dist` positions inside a document;
    pmi = ln((c_pair/P) / ((c_a/N)(c_b/N))) with min_count support.
    The corpus-collocation table every tokenizer/phrase-vocab build
    starts from.

    Scale shape (100 TB): the pair generator is ONE per-doc
    higher-order function over the token array (each position pairs
    with its next `max_dist` neighbours — per-doc work exactly
    O(len * max_dist), zero shuffle, zero join; the r7 doc-keyed
    positional self-join enumerated O(len^2) pairs inside the join
    before the distance filter could apply, planting a quadratic
    straggler on any long document); pair/unigram counts shuffle on
    their own keys with map-side partial aggregation; P aggregates the
    vocabulary-sized UNFILTERED pair-count table (never a second pass
    over the corpus-sized pair stream); N and P ride 1-row broadcast
    scalar joins; the final top-k is orderBy().limit() — Spark plans
    TakeOrderedAndProject, no global window, no full sort. PMI is
    rounded to 6 BEFORE ranking so both engines rank identical keys
    (ties break on the word pair).
    """
    from dbt_fusion_spark.plans.partitioning import ensure_parallelism

    # Tokenizer identical to search.positional_postings: lowercased
    # whitespace words, empty tokens dropped.
    toks = ensure_parallelism(df).select(F.expr(
        f"filter(split(trim(lower({text_col})), '\\\\s+'),"
        " x -> x != '')").alias("__w"))
    pairs = toks.filter(F.size("__w") >= 2).select(F.explode(F.expr(
        "flatten(transform(sequence(0, size(__w) - 2), i ->"
        f" transform(sequence(i + 1, least(i + {int(max_dist)},"
        "                                  size(__w) - 1)), j ->"
        "   named_struct('w1', least(__w[i], __w[j]),"
        "                'w2', greatest(__w[i], __w[j])))))"
    )).alias("__p")).select("__p.w1", "__p.w2")
    cp_all = pairs.groupBy("w1", "w2").agg(F.count("*").alias("__cp"))
    cp = cp_all.filter(F.col("__cp") >= min_count)
    cu = (toks.select(F.explode("__w").alias("token"))
          .groupBy("token").agg(F.count("*").alias("__cu")))
    n_scalar = cu.agg(F.sum("__cu").alias("__N"))
    p_scalar = cp_all.agg(F.sum("__cp").alias("__P"))
    j = (cp.join(cu.select(F.col("token").alias("w1"),
                           F.col("__cu").alias("__ca")), "w1")
         .join(cu.select(F.col("token").alias("w2"),
                         F.col("__cu").alias("__cb")), "w2"))
    j = _join_scalar(j, "__cp", n_scalar, "__N")
    j = _join_scalar(j, "__cp", p_scalar, "__P")
    pmi = F.round(
        F.log((F.col("__cp").cast("double")
               * F.col("__N").cast("double") * F.col("__N").cast("double"))
              / (F.col("__P").cast("double")
                 * F.col("__ca").cast("double")
                 * F.col("__cb").cast("double"))), 6)
    return (
        j.select("w1", "w2", F.col("__cp").cast("bigint").alias("c_pair"),
                 pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k))


def zipf_fit(df: DataFrame, id_col: str, text_col: str,
             min_count: int = 2) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS of
    ln(freq) on ln(rank) over terms with freq >= min_count. A healthy
    natural-language corpus fits slope ~ -1; a flat slope flags
    templated/synthetic text, a cliff flags boilerplate domination —
    the one-row corpus-health audit.

    Emits ONE row: n_terms, slope, intercept (round-6 — the OLS sums
    fold doubles whose order differs across engines), r2. Rank ties
    break by token (deterministic cross-engine).

    Scale shape: one token-count shuffle; the rank window orders the
    TERM table (vocabulary-sized, not corpus-sized); the OLS moments
    are one aggregate. No iteration, no Python.
    """
    cnt = (tokens(df, id_col, text_col)
           .groupBy("token").agg(F.count("*").alias("__c"))
           .filter(F.col("__c") >= min_count))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("__c").desc(), "token")
    xy = cnt.select(
        F.log(F.row_number().over(w).cast("double")).alias("__x"),
        F.log(F.col("__c").cast("double")).alias("__y"))
    m = xy.agg(F.count("*").alias("n"), F.sum("__x").alias("sx"),
               F.sum("__y").alias("sy"), F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
               F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
               F.sum(F.col("__y") * F.col("__y")).alias("syy"))
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6)
        .alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"))


def tfidf_cosine_pairs(df: DataFrame, id_col: str, text_col: str,
                       min_cos: float = 0.5,
                       max_df: int | None = 1000) -> DataFrame:
    """Lexical near-dup pairs by tf-idf cosine — the sparse-vector
    complement to embedding cosine (embedding_near_dups) and shingle
    Jaccard (dedup_minhash_lsh): documents sharing weighted vocabulary
    score high even when word ORDER differs entirely (paraphrase
    shuffles, list reorderings — shapes shingles miss). w(d,t) =
    tf * ln(N/df); pairs share the token-keyed self-join of the
    per-doc weight table, O(sum df_t^2) and never all-pairs; `max_df`
    prunes ubiquitous terms before the join (their idf ~ 0 anyway —
    pruning changes the subspace, and norms are computed over the SAME
    pruned vocabulary so the emitted value is a true cosine there).

    Float discipline: each w_a*w_b product and each w^2 term is
    round(9)-quantized and summed as DECIMAL(38,9) — exact,
    order-independent — then cast back to double for the sqrt/divide,
    so the emitted cosine is bit-identical across engines (the
    module's established recipe).

    Scale shape: two token-keyed aggregates (tf, df), one bounded
    self-join, one pair-keyed aggregate; N rides the 1-row broadcast
    scalar join. No windows, no cross join, no Python.
    """
    tf = (tokens(df, id_col, text_col)
          .groupBy(F.col(id_col).alias("__id"), "token")
          .agg(F.count(F.lit(1)).cast("bigint").alias("__tf")))
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("__df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_df)
    n_docs = tf.select("__id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__N"))
    wt = _join_scalar(tf.join(dfreq, "token"), "__tf", n_docs, "__N")
    w = (F.col("__tf").cast("double")
         * F.log(F.col("__N").cast("double")
                 / F.col("__df").cast("double")))
    # the weight table feeds BOTH self-join sides and the norms — cut
    # it once so the tokenize+tf+df pipeline is computed once, not
    # three times (r11; localCheckpoint is semantically transparent)
    wt = (wt.select("__id", "token", w.alias("__w"))
          .localCheckpoint(eager=True))
    norms = (wt.groupBy("__id")
             .agg(F.sqrt(
                 F.sum(F.round(F.col("__w") * F.col("__w"), 9)
                       .cast("decimal(38,9)")).cast("double"))
                 .alias("__nrm"))
             .localCheckpoint(eager=True))
    a = wt.select(F.col("__id").alias("id_a"), "token",
                  F.col("__w").alias("__wa"))
    b = wt.select(F.col("__id").alias("id_b"), "token",
                  F.col("__w").alias("__wb"))
    dots = (a.join(b, "token")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.round(F.col("__wa") * F.col("__wb"), 9)
                       .cast("decimal(38,9)")).cast("double")
                 .alias("__dot")))
    return (dots
            .join(norms.select(F.col("__id").alias("id_a"),
                               F.col("__nrm").alias("__na")), "id_a")
            .join(norms.select(F.col("__id").alias("id_b"),
                               F.col("__nrm").alias("__nb")), "id_b")
            .select("id_a", "id_b",
                    (F.col("__dot") / (F.col("__na") * F.col("__nb")))
                    .alias("cos_sim"))
            .filter(F.col("cos_sim") >= F.lit(float(min_cos))))


def js_divergence(df_a: DataFrame, df_b: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
    """Jensen-Shannon divergence between two corpus slices' token
    distributions — the drift/contamination dial: 0 = identical
    mixture, ln(2) = disjoint vocabularies. The one-row audit a data
    curator reads before blending a new crawl into a training mix
    (JSD is symmetric and bounded, unlike raw KL).

    JSD = 0.5*KL(P||M) + 0.5*KL(Q||M) with M = (P+Q)/2, summed over
    the union vocabulary (terms absent from one side contribute only
    via the other's half — no smoothing needed: x*ln(x) -> 0).

    Float discipline: each term's contribution is round(9)-quantized
    and summed as DECIMAL(38,9) (exact, order-independent); the final
    scalar is round(6) (ln-derived, the module's emission recipe).

    Scale shape: one token-count aggregate per slice (map-side
    partials), a full-outer equi-join on the token (vocabulary-sized),
    scalars ride 1-row broadcast joins, final sum is one aggregate.
    """
    ca = (tokens(df_a, id_col, text_col).groupBy("token")
          .agg(F.count(F.lit(1)).cast("bigint").alias("__ca")))
    cb = (tokens(df_b, id_col, text_col).groupBy("token")
          .agg(F.count(F.lit(1)).cast("bigint").alias("__cb")))
    na = ca.agg(F.sum("__ca").alias("__na"))
    nb = cb.agg(F.sum("__cb").alias("__nb"))
    j = (ca.join(cb, "token", "full")
         .select(F.coalesce("__ca", F.lit(0)).alias("__ca"),
                 F.coalesce("__cb", F.lit(0)).alias("__cb")))
    j = _join_scalar(_join_scalar(j, "__ca", na, "__na"),
                     "__ca", nb, "__nb")
    p = F.col("__ca").cast("double") / F.col("__na").cast("double")
    q = F.col("__cb").cast("double") / F.col("__nb").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (F.when(F.col("__ca") > 0,
                   F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
            + F.when(F.col("__cb") > 0,
                     F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0)))
    return (j.select(
        F.round(term, 9).cast("decimal(38,9)").alias("__t"),
        "__na", "__nb", "__ca", "__cb")
        .agg(F.round(F.sum("__t").cast("double"), 6).alias("jsd"),
             F.max("__na").alias("n_tokens_a"),
             F.max("__nb").alias("n_tokens_b"),
             F.sum(F.when(F.col("__ca") > 0, 1).otherwise(0))
             .cast("bigint").alias("vocab_a"),
             F.sum(F.when(F.col("__cb") > 0, 1).otherwise(0))
             .cast("bigint").alias("vocab_b")))


def novelty_ngrams(corpus: DataFrame, reference: DataFrame, id_col: str,
                   text_col: str, n: int = 13) -> DataFrame:
    """Per-document n-gram novelty vs a REFERENCE corpus: the fraction
    of a doc's distinct n-grams never seen in the reference — the
    inverse of decontamination containment, read as "how much genuinely
    new text does this crawl add?" (dedup keeps novel docs; a near-zero
    novelty score at n=13 means the doc is stitched from reference
    text even if no single probe matches).

    Scale shape: both sides build distinct n-gram tables (Generate +
    distinct — the decontamination machinery); the membership test is
    a LEFT ANTI equi-join on the gram (never a cross join); the
    emitted fraction is the raw integer-ratio double (midpoint-safe).
    Docs shorter than n words emit n_grams = 0 with novelty NULL.
    """
    from dbt_fusion_spark.llm.quality import word_ngrams

    doc_grams = word_ngrams(corpus, id_col, text_col, n=n) \
        .dropDuplicates([id_col, "gram"])
    ref_grams = word_ngrams(reference, id_col, text_col, n=n) \
        .select("gram").distinct()
    novel = (doc_grams.join(ref_grams, "gram", "left_anti")
             .groupBy(id_col)
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel")))
    total = (doc_grams.groupBy(id_col)
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams")))
    base = corpus.select(id_col).distinct()
    return (base.join(total, id_col, "left").join(novel, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_grams", F.lit(0)).cast("bigint")
                .alias("n_grams"),
                F.coalesce(
                    F.when(F.col("n_grams").isNotNull(), F.coalesce(
                        "n_novel", F.lit(0))), F.lit(None))
                .cast("bigint").alias("n_novel"),
                F.when(F.col("n_grams").isNotNull(),
                       F.coalesce("n_novel", F.lit(0)).cast("double")
                       / F.col("n_grams").cast("double"))
                .alias("novelty_frac")))


def lexical_diversity(df: DataFrame, domain_col: str,
                      text_col: str) -> DataFrame:
    """Per-domain lexical-diversity profile: token count N, vocabulary
    size V, type-token ratio V/N, hapax fraction (share of vocabulary
    seen exactly once), and mean token frequency N/V — the dials that
    separate template/boilerplate domains (low TTR) from organic text
    and flag machine-generated repetition before any model-based
    scorer runs.

    Scale: one explode + one (domain, token)-keyed map-side-combined
    aggregate onto the vocabulary grid, then a domain-keyed rollup of
    that grid.  Integer counts end to end; ratios are exact-operand
    double divisions emitted at round(6).
    """
    toks = (df.select(F.col(domain_col).alias("domain"),
                      F.explode(
                          F.filter(
                              F.split(F.trim(F.lower(F.col(text_col))),
                                      r"\s+"),
                              lambda t: t != "")).alias("token")))
    vocab = (toks.groupBy("domain", "token")
                 .agg(F.count(F.lit(1)).alias("c")))
    out = (vocab.groupBy("domain")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_types"),
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_hapax")))
    n, v = F.col("n_tokens").cast("double"), F.col("n_types").cast("double")
    return out.select(
        "domain", "n_tokens", "n_types", "n_hapax",
        F.round(v / n, 6).alias("type_token_ratio"),
        F.round(F.col("n_hapax").cast("double") / v, 6)
         .alias("hapax_frac"),
        F.round(n / v, 6).alias("mean_token_freq"))


def domain_js_matrix(df: DataFrame, domain_col: str, id_col: str,
                     text_col: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two domains'
    unigram distributions — the mixture-design matrix (which sources
    are redundant, which add genuinely new text) that js_divergence
    gives for one pair, computed for ALL pairs in one plan.

    Returns one row per unordered domain pair (a < b) with both token
    totals and the JSD (0 = identical mixture, ln 2 = disjoint).

    Scale: ONE (domain, token) aggregate; the pair stream is a
    token-keyed self-join of that bounded rollup (|domains| x vocab —
    same shape as tfidf pairing), so terms for every pair materialize
    without re-scanning text; term sums ride round(9)->DECIMAL.
    Tokens absent from one domain of a pair contribute via the
    present side only (x ln x -> 0; JSD needs no smoothing), which the
    full-outer pair alignment below realizes by splitting each
    domain-total into in-join and missing-mass parts: a token missing
    from domain b contributes 0.5 * p * ln(p / (p/2)) = 0.5 p ln 2 —
    aggregated in closed form from the per-pair matched mass, so the
    join never needs the absent rows at all.
    """
    # tokens() keeps only (id, token) — pass the DOMAIN as the id
    # column so the rollup key survives the explode
    dt = (tokens(df, domain_col, text_col)
          .groupBy(F.col(domain_col).alias("d"), "token")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    tot = dt.groupBy("d").agg(F.sum("c").alias("n"))
    a = (dt.join(tot, "d")
         .select(F.col("d").alias("da"), "token",
                 (F.col("c").cast("double") / F.col("n").cast("double"))
                 .alias("p"),
                 F.col("n").alias("na")))
    b = (dt.join(tot, "d")
         .select(F.col("d").alias("db"), "token",
                 (F.col("c").cast("double") / F.col("n").cast("double"))
                 .alias("q"),
                 F.col("n").alias("nb")))
    pair = a.join(b, "token").filter(F.col("da") < F.col("db"))
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    # matched-token JSD terms + matched mass per side (the complement
    # of the matched mass is exactly the absent-token mass, whose
    # closed-form contribution is 0.5 * ln 2 * (1 - matched))
    term = (F.lit(0.5) * F.col("p") * F.log(F.col("p") / m)
            + F.lit(0.5) * F.col("q") * F.log(F.col("q") / m))
    g = (pair.groupBy("da", "db")
         .agg(F.sum(F.round(term, 9).cast("decimal(38,9)"))
              .alias("__t"),
              F.sum(F.round(F.col("p"), 9).cast("decimal(38,9)"))
              .alias("__mp"),
              F.sum(F.round(F.col("q"), 9).cast("decimal(38,9)"))
              .alias("__mq"),
              F.max("na").alias("n_tokens_a"),
              F.max("nb").alias("n_tokens_b"),
              F.count(F.lit(1)).cast("bigint").alias("shared_vocab")))
    import math

    # pair UNIVERSE from the bounded domain grid: a fully disjoint
    # pair has zero matched tokens, so it never appears in the
    # token-keyed join at all — exactly the pair whose JSD (= ln 2)
    # matters most.  Constant-but-opaque key keeps the bounded
    # grid x grid pairing a BroadcastHashJoin, never a cartesian.
    ua = tot.select(F.col("d").alias("da"), F.col("n").alias("ua_n")) \
            .withColumn("__k", F.pmod(F.abs(F.xxhash64("da")), F.lit(1)))
    ub = tot.select(F.col("d").alias("db"), F.col("n").alias("ub_n")) \
            .withColumn("__k", F.pmod(F.abs(F.xxhash64("db")), F.lit(1)))
    univ = (ua.join(F.broadcast(ub), "__k").drop("__k")
            .filter(F.col("da") < F.col("db")))
    g = univ.join(g, ["da", "db"], "left")
    mp = F.coalesce(F.col("__mp").cast("double"), F.lit(0.0))
    mq = F.coalesce(F.col("__mq").cast("double"), F.lit(0.0))
    jsd = (F.coalesce(F.col("__t").cast("double"), F.lit(0.0))
           + F.lit(0.5 * math.log(2.0))
           * ((F.lit(1.0) - mp) + (F.lit(1.0) - mq)))
    return g.select(
        F.col("da").alias("domain_a"), F.col("db").alias("domain_b"),
        F.col("ua_n").cast("bigint").alias("n_tokens_a"),
        F.col("ub_n").cast("bigint").alias("n_tokens_b"),
        F.coalesce("shared_vocab", F.lit(0)).cast("bigint")
         .alias("shared_vocab"),
        F.round(jsd, 6).alias("jsd"))


def simpson_diversity(df: DataFrame, domain_col: str,
                      text_col: str) -> DataFrame:
    """Per-domain token-distribution DIVERSITY profile — the
    probability-weighted complement to lexical_diversity (which counts
    types; this weighs them): Gini-Simpson 1 - sum p², Shannon entropy
    H = -sum p ln p (nats), the effective vocabulary e^H ("how many
    equally-common tokens would look like this"), and Berger-Parker
    max p (single-token dominance).  Low diversity at high volume is
    the template/spam-domain signature no length filter catches.

    Scale: the lexical_diversity (domain, token) grid aggregate, then
    one domain-keyed rollup with round(9)->DECIMAL p-term sums
    (order-free); ratios are exact-operand double divisions at
    round(6).
    """
    from dbt_fusion_spark.plans.stats import D389, _d2d, _qterm

    toks = (df.select(F.col(domain_col).alias("domain"),
                      F.explode(
                          F.filter(
                              F.split(F.trim(F.lower(F.col(text_col))),
                                      r"\s+"),
                              lambda t: t != "")).alias("token")))
    vocab = (toks.groupBy("domain", "token")
                 .agg(F.count(F.lit(1)).alias("c")))
    wdom = Window.partitionBy("domain")
    g = vocab.withColumn("n", F.sum("c").over(wdom))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    agg = (g.groupBy("domain")
           .agg(F.max("n").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_types"),
                F.sum(_qterm(p * p)).alias("__p2"),
                F.sum(_qterm(-p * F.log(p))).alias("__h"),
                F.max("c").cast("bigint").alias("__cmax")))
    h = _d2d("__h")
    return agg.select(
        "domain", "n_tokens", "n_types",
        F.round(F.lit(1.0) - _d2d("__p2"), 6).alias("gini_simpson"),
        F.round(h, 6).alias("shannon_nats"),
        F.round(F.exp(h), 6).alias("effective_vocab"),
        F.round(F.col("__cmax").cast("double")
                / F.col("n_tokens").cast("double"), 6)
         .alias("berger_parker"))
