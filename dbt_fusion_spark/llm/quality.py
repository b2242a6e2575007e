"""Corpus-quality signals and decontamination for training-data
pipelines (beyond-reference surface, same family as llm/text.py).

Gopher-style repetition/quality flags (Rae et al. 2021, "Scaling
Language Models" §A1.1, public paper) as pure column algebra — every
signal is a JVM-side expression over the text column, no Python in the
row path, so the whole thing rides whole-stage codegen at 100 TB.

Benchmark decontamination: flag documents sharing any word-n-gram with
a probe corpus (the public n-gram-overlap method used for GPT-3/PaLM
test-set filtering). Implemented as shingle-hash equi-join: probe side
is tiny -> broadcast; the corpus side explodes to (doc, gram) rows,
dedups per doc, and joins — cost is O(corpus grams), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Gopher's stop-word presence list (public paper, §A1.1)
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _lines(text_col: str) -> Column:
    return F.split(F.col(text_col), "\n")


def _words(text_col: str) -> Column:
    # split on whitespace runs; trim first so no empty edge tokens
    return F.split(F.trim(F.col(text_col)), "\\s+")


def gopher_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition/quality signals:

    - n_words, mean_word_len
    - frac_alpha_words: words containing at least one letter
    - dup_line_frac: 1 - distinct lines / lines (repetition)
    - frac_bullet_lines / frac_ellipsis_lines (boilerplate shape)
    - n_stop_words: how many of the 8 Gopher stop words appear
    """
    words = _words(text_col)
    lines = _lines(text_col)
    n_words = F.size(words)
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    bullet_lines = F.size(F.filter(
        lines, lambda ln: ln.rlike("^\\s*([-*•]|[0-9]+[.)])\\s")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda ln: ln.rlike("(\\.\\.\\.|…)\\s*$")))
    lower_words = F.transform(words, F.lower)
    n_stop = F.size(F.array_intersect(
        F.array_distinct(lower_words),
        F.array(*[F.lit(w) for w in STOP_WORDS])))
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        F.when(n_words > 0, total_chars / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(n_words > 0, alpha_words / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("frac_alpha_words"),
        dup_line_frac.alias("dup_line_frac"),
        F.when(n_lines > 0, bullet_lines / n_lines.cast("double"))
         .otherwise(F.lit(0.0)).alias("frac_bullet_lines"),
        F.when(n_lines > 0, ellipsis_lines / n_lines.cast("double"))
         .otherwise(F.lit(0.0)).alias("frac_ellipsis_lines"),
        n_stop.cast("bigint").alias("n_stop_words"),
    )


def gopher_filter(df: DataFrame, text_col: str, id_col: str,
                  min_words: int = 50, max_words: int = 100_000,
                  min_mean_word_len: float = 3.0,
                  max_mean_word_len: float = 10.0,
                  max_dup_line_frac: float = 0.30,
                  min_frac_alpha: float = 0.80,
                  min_stop_words: int = 2) -> DataFrame:
    """Keep documents passing the Gopher thresholds (paper defaults
    adapted); returns (id, keep, reject_reason) so a pipeline can both
    filter and audit what it dropped."""
    s = gopher_signals(df, text_col, id_col)
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("n_words") > max_words, F.lit("too_long"))
        .when(F.col("mean_word_len") < min_mean_word_len,
              F.lit("short_words"))
        .when(F.col("mean_word_len") > max_mean_word_len, F.lit("long_words"))
        .when(F.col("dup_line_frac") > max_dup_line_frac,
              F.lit("repetitive_lines"))
        .when(F.col("frac_alpha_words") < min_frac_alpha,
              F.lit("non_alpha"))
        .when(F.col("n_stop_words") < min_stop_words, F.lit("no_stop_words"))
    )
    return s.select(
        id_col,
        reason.isNull().alias("keep"),
        F.coalesce(reason, F.lit("ok")).alias("reject_reason"),
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       n: int = 2) -> DataFrame:
    """Gopher §A1.1 word-n-gram repetition signals, per document:

    - top_ngram_char_frac: characters covered by occurrences of the
      MOST frequent word n-gram / total normalized chars (ties break
      deterministically: count desc, gram asc).
    - dup_ngram_char_frac: characters covered by all n-grams occurring
      more than once, clamped to 1.0 (overlapping occurrences may
      double-count chars; the clamp keeps the signal a fraction —
      documented approximation of the paper's non-overlapping count).

    Shape: Generate (gram explode) -> count per (doc, gram) -> window
    top-1 + aggregate, both keyed on the doc — ONE shuffle of
    gram-count rows, then a 1:1 join against per-doc lengths. No
    Python, no arrays held per row after the explode.
    """
    from pyspark.sql import Window

    grams = word_ngrams(df, id_col, text_col, n)
    counted = grams.groupBy(id_col, "gram").agg(F.count("*").alias("__n"))
    w = Window.partitionBy(id_col).orderBy(F.desc("__n"), F.asc("gram"))
    gram_chars = F.length("gram") * F.col("__n")
    per_doc = (
        counted.withColumn("__rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("gram"))).alias("top_gram"),
            F.max(F.when(F.col("__rn") == 1, F.col("__n")))
            .cast("bigint").alias("top_gram_n"),
            F.max(F.when(F.col("__rn") == 1, gram_chars)).alias("__top_chars"),
            F.sum(F.when(F.col("__n") > 1, gram_chars)
                  .otherwise(F.lit(0))).alias("__dup_chars"),
        )
    )
    doc_len = df.select(
        F.col(id_col),
        F.length(F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                                  r"\s+", " ")).alias("__len"))
    return (
        per_doc.join(doc_len, id_col)
        .select(
            id_col, "top_gram", "top_gram_n",
            F.when(F.col("__len") > 0,
                   F.col("__top_chars") / F.col("__len").cast("double"))
            .otherwise(F.lit(0.0)).alias("top_ngram_char_frac"),
            F.least(
                F.lit(1.0),
                F.when(F.col("__len") > 0,
                       F.col("__dup_chars") / F.col("__len").cast("double"))
                .otherwise(F.lit(0.0))).alias("dup_ngram_char_frac"),
        )
    )


def word_ngrams(df: DataFrame, id_col: str, text_col: str, n: int = 13
                ) -> DataFrame:
    """(id, gram) long form of word-level n-grams: lowercase, split,
    explode the start index, slice + join. Stays JVM-side; one Generate
    node per doc feeds the downstream join. ensure_parallelism splits
    a single-row-group local scan so the per-gram slice+join work runs
    on every core (no-op at fleet scale — r11)."""
    from dbt_fusion_spark.plans.partitioning import ensure_parallelism

    words = F.transform(_words(text_col), F.lower)
    df = ensure_parallelism(df).select(F.col(id_col), words.alias("__w")) \
           .filter(F.size("__w") >= n)
    starts = F.sequence(F.lit(1), F.size("__w") - (n - 1))
    return (df.select(id_col, "__w", F.explode(starts).alias("__i"))
              .select(id_col,
                      F.array_join(F.slice("__w", F.col("__i"), n), " ")
                       .alias("gram")))


def decontaminate(corpus: DataFrame, probes: DataFrame, id_col: str,
                  text_col: str, n: int = 13) -> DataFrame:
    """Documents sharing any word-n-gram with the probe set:
    (id, n_hits, n_probe_docs). Probe grams are distinct + broadcast
    (benchmarks are tiny vs a 100 TB corpus); repeated grams count once
    via countDistinct AFTER the join — deduplicating the raw corpus
    gram stream first would shuffle every gram in the corpus, while the
    broadcast join filters map-side so only MATCHED grams (a benchmark-
    sized trickle) ever shuffle to the per-doc aggregate."""
    corpus_grams = word_ngrams(corpus, id_col, text_col, n)
    probe_grams = (word_ngrams(probes, id_col, text_col, n)
                   .withColumnRenamed(id_col, "probe_id").distinct())
    hits = corpus_grams.join(F.broadcast(probe_grams), "gram")
    return (hits.groupBy(id_col)
            .agg(F.countDistinct("gram").cast("bigint").alias("n_hits"),
                 F.countDistinct("probe_id").cast("bigint")
                  .alias("n_probe_docs")))


def _bloom_positions(gram_col: str, m_bits: int, k: int):
    """k bit positions for a gram: Kirsch–Mitzenmacher double hashing
    over one md5 — pos_i = (a + i·b) mod m, (a, b) = the digest's first
    two 32-bit hex chunks (same engine-portable family as MinHash in
    llm/dedup.py). Returns the DISTINCT positions array column (self-
    collisions collapse so the all-bits-set test counts right)."""
    digest = F.md5(F.col(gram_col))
    a = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    b = F.conv(F.substring(digest, 9, 8), 16, 10).cast("bigint")
    return F.array_distinct(F.array(
        *[F.pmod(a + F.lit(i) * b, F.lit(m_bits)) for i in range(k)]))


def bloom_prefilter(corpus: DataFrame, probes: DataFrame, id_col: str,
                    text_col: str, n: int = 13,
                    m_bits: int = 63 * 1024, k: int = 3) -> DataFrame:
    """Bloom-filter prefilter for n-gram decontamination, with its
    false-positive rate audited against the exact join.

    At 100 TB the exact probe join (decontaminate) broadcasts the full
    probe gram STRINGS (a benchmark suite can be GBs of 13-grams); the
    production prefilter ships only m bits. Here the filter is built
    and applied entirely in column algebra so a DuckDB oracle can
    restate it bit-for-bit:

    - probe grams -> k double-hashed bit positions -> packed into
      63-bit words (bit 63 never set: arithmetic >> stays clean in
      every engine) -> ONE dense array<long> row of m/63 words.
    - the dense row rides a 1-row broadcast hash join (corpus._join_
      scalar's pmod trick — no BNLJ); per-gram membership is a pure
      projection: forall k positions, (word >> bit) & 1 = 1.
    - per-doc: n_grams, n_bloom_hits (prefilter positives) and
      n_true_hits (exact join) — n_bloom_hits >= n_true_hits always
      (no false negatives); the gap is the FP overhead the second-
      stage exact check pays.
    """
    from dbt_fusion_spark.llm.corpus import _join_scalar

    n_words = (m_bits + 62) // 63
    spark = corpus.sparkSession

    probe_grams = (word_ngrams(probes, id_col, text_col, n)
                   .select("gram").distinct())
    probe_pos = (probe_grams
                 .select(F.explode(_bloom_positions("gram", m_bits, k))
                         .alias("pos"))
                 .distinct())
    sparse = (probe_pos
              .select((F.col("pos") / 63).cast("bigint").alias("w"),
                      F.pmod(F.col("pos"), 63).cast("int").alias("bit"))
              .groupBy("w")
              .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))")
                   .alias("bits")))
    dense = (spark.range(n_words).withColumnRenamed("id", "w")
             .join(sparse, "w", "left")
             .select("w", F.coalesce("bits", F.lit(0)).alias("bits"))
             .agg(F.expr("transform(sort_array(collect_list(struct(w, bits))),"
                         " s -> s.bits)").alias("__bloom"),
                  F.count("*").cast("bigint").alias("__nw")))

    cg = (word_ngrams(corpus, id_col, text_col, n)
          .withColumn("__parr", _bloom_positions("gram", m_bits, k))
          .withColumn("__glen", F.length("gram").cast("bigint"))
          .join(F.broadcast(probe_grams.withColumn("__probe", F.lit(1))),
                "gram", "left"))
    flagged = _join_scalar(cg, "__glen", dense, "__nw").withColumn(
        "__bloom_hit",
        F.expr("forall(__parr, p -> (shiftright(element_at(__bloom,"
               " CAST(p div 63 AS INT) + 1), CAST(p % 63 AS INT))"
               " & 1) = 1)"))
    return (flagged.groupBy(id_col)
            .agg(F.countDistinct("gram").cast("bigint").alias("n_grams"),
                 F.countDistinct(F.when(F.col("__bloom_hit"), F.col("gram")))
                  .cast("bigint").alias("n_bloom_hits"),
                 F.countDistinct(F.when(F.col("__probe") == 1, F.col("gram")))
                  .cast("bigint").alias("n_true_hits")))


def unigram_loglik(df: DataFrame, id_col: str, text_col: str,
                   alpha: float = 0.5) -> DataFrame:
    """CCNet-style statistical quality score: fit an add-alpha-smoothed
    unigram language model on the corpus itself, then score every
    document by its average negative log-likelihood under that model.
    Low scores = typical text; high scores = rare-token soup (mojibake,
    code dumps, lorem) — the standard cheap proxy when a real KenLM
    n-gram model isn't available in-engine.

    Scale shape: one token-keyed shuffle builds the global count table,
    a second builds per-doc term frequencies; they equi-join on the
    token (both sides already partitioned by it), and the corpus-wide
    scalars (total tokens N, vocabulary V) ride the 1-row broadcast
    hash join from corpus._join_scalar — no collect, no cross join.
    The emitted double is rounded to 6 places: the per-doc sum order
    differs across engines, so raw ULPs would not reproduce."""
    from dbt_fusion_spark.llm.corpus import _join_scalar, tokens

    # Single corpus scan: global token counts DERIVE from the per-doc
    # tf table (sum of tf == raw count), so the text is tokenized once
    # and the tf exchange is reused for both branches.
    toks = tokens(df, id_col, text_col)
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("__tf"))
    cnt = tf.groupBy("token").agg(F.sum("__tf").alias("__cnt"))
    scalar = cnt.agg(F.sum("__cnt").alias("__N"),
                     F.count("*").alias("__V"))
    scored = _join_scalar(tf.join(cnt, "token"), "__tf", scalar, "__N")
    logp = F.log((F.col("__cnt") + F.lit(alpha))
                 / (F.col("__N") + F.lit(alpha) * F.col("__V")))
    return (
        scored.groupBy(id_col)
        .agg(F.sum("__tf").cast("bigint").alias("n_tokens"),
             F.sum(F.col("__tf") * logp).alias("__ll"))
        .select(
            id_col, "n_tokens",
            F.round(-F.col("__ll") / F.col("n_tokens"), 6)
            .alias("avg_neg_loglik"),
        )
    )


def bigram_loglik(df: DataFrame, id_col: str, text_col: str,
                  alpha: float = 0.5, lam: float = 0.7) -> DataFrame:
    """Interpolated BIGRAM language-model quality score — the context-
    aware upgrade of unigram_loglik (which cannot tell shuffled word
    soup from fluent text, since it ignores order):

        p(w2 | w1) = lam * (c(w1 w2)+a)/(c(w1)+aV)
                   + (1-lam) * (c(w2)+a)/(N+aV)

    fit on the corpus itself, each doc scored by the average negative
    log-likelihood over its bigram transitions (docs with < 2 tokens
    have no transitions and are omitted).  The Jelinek-Mercer unigram
    backoff keeps unseen bigrams finite; low = fluent/typical, high =
    order-scrambled or rare-token text.

    Scale: one id-keyed window builds the adjacency stream (pos-lag,
    same volume as tokenization); bigram/unigram count joins are all
    co-keyed equi-joins; corpus scalars (N, V) ride the 1-row
    broadcast join.  Emitted double rounds to 6 (per-doc sum order
    differs across engines — the unigram_loglik convention).
    """
    from pyspark.sql import Window

    from dbt_fusion_spark.llm.corpus import _join_scalar

    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    pos_toks = (df.select(F.col(id_col),
                          F.posexplode(arr).alias("pos", "token"))
                .filter(F.col("token") != ""))
    w = Window.partitionBy(id_col).orderBy("pos")
    big = (pos_toks
           .withColumn("w1", F.lag("token").over(w))
           .filter(F.col("w1").isNotNull())
           .select(id_col, "w1", F.col("token").alias("w2")))
    uni_cnt = pos_toks.groupBy("token") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cu"))
    scalar = uni_cnt.agg(F.sum("__cu").alias("__N"),
                         F.count(F.lit(1)).alias("__V"))
    big_cnt = big.groupBy("w1", "w2") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cb"))
    tf = big.groupBy(id_col, "w1", "w2") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tf"))
    j = (tf.join(big_cnt, ["w1", "w2"])
         .join(uni_cnt.select(F.col("token").alias("w1"),
                              F.col("__cu").alias("__c1")), "w1")
         .join(uni_cnt.select(F.col("token").alias("w2"),
                              F.col("__cu").alias("__c2")), "w2"))
    j = _join_scalar(j, "__tf", scalar, "__N")
    a = F.lit(alpha)
    av = a * F.col("__V")
    pb = (F.col("__cb") + a) / (F.col("__c1").cast("double") + av)
    pu = (F.col("__c2") + a) / (F.col("__N").cast("double") + av)
    logp = F.log(F.lit(lam) * pb + F.lit(1.0 - lam) * pu)
    return (j.groupBy(id_col)
            .agg(F.sum("__tf").cast("bigint").alias("n_bigrams"),
                 F.sum(F.col("__tf") * logp).alias("__ll"))
            .select(id_col, "n_bigrams",
                    F.round(-F.col("__ll") / F.col("n_bigrams"), 6)
                    .alias("avg_neg_loglik")))


def containment_scores(corpus: DataFrame, probes: DataFrame, id_col: str,
                       text_col: str, n: int = 5,
                       threshold: float = 0.5) -> DataFrame:
    """Fuzzy benchmark contamination via n-gram CONTAINMENT (the
    asymmetric cousin of Jaccard): for each (corpus doc, probe) pair,
    |grams(probe) ∩ grams(doc)| / |grams(probe)| — the fraction of the
    benchmark item present in the training document. Catches padded or
    lightly-edited copies that exact 13-gram matching misses; emit
    pairs at or above `threshold`.

    Scale shape: probe grams (distinct) and probe sizes are broadcast —
    benchmarks are tiny against a 100 TB corpus — so the corpus gram
    stream filters MAP-SIDE and only matched grams shuffle to the
    per-(doc, probe) aggregate. Never a corpus-wide distinct."""
    corpus_grams = word_ngrams(corpus, id_col, text_col, n)
    probe_grams = (word_ngrams(probes, id_col, text_col, n)
                   .withColumnRenamed(id_col, "probe_id").distinct())
    probe_sizes = probe_grams.groupBy("probe_id").agg(
        F.count("*").cast("bigint").alias("__np"))
    hits = (corpus_grams.join(F.broadcast(probe_grams), "gram")
            .groupBy(id_col, "probe_id")
            .agg(F.countDistinct("gram").cast("bigint").alias("n_common")))
    return (
        hits.join(F.broadcast(probe_sizes), "probe_id")
        .select(
            id_col, "probe_id", "n_common",
            F.round(F.col("n_common") / F.col("__np"), 9)
            .alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def _blk_strip(c):
    """Edge-punctuation strip on an already-lowercased token."""
    return F.regexp_replace(
        F.regexp_replace(c, r"^[^a-z0-9]+", ""), r"[^a-z0-9]+$", "")


def blocklist_filter(df: DataFrame, id_col: str, text_col: str,
                     terms: DataFrame, term_col: str = "term",
                     max_terms_sample: int = 5) -> DataFrame:
    """C4-style blocklist ("bad words") document filter: a document is
    rejected when its word-token sequence contains ANY blocklist term —
    single words AND multi-word phrases (the real LDNOOBW list used by
    C4 at https://github.com/google-research/text-to-text-transfer-
    transformer mixes both) — case-insensitively on whole-word
    boundaries. Emits (id, keep, n_hits, n_distinct_terms,
    sample_terms): the counts feed the rejection dashboard and
    sample_terms (first `max_terms_sample`, sorted, normalized form)
    makes audits reproducible.

    BOTH sides get the identical normalization — lowercase,
    whitespace-run split, per-word edge-punctuation strip, single-space
    rejoin — so a noisy blocklist row like ' Badword! ' still matches
    the document token 'badword,'. A term with n words matches against
    the document's n-token phrases (overlapping windows over the
    stripped token sequence), so hits are counted per occurrence.

    Scale shape: the blocklist is a TABLE, not a regex — per distinct
    phrase length n in the list, the corpus explodes its n-token
    windows once and broadcast-joins the (tiny) length-n term subset;
    one bounded driver action reads the DISTINCT PHRASE LENGTHS (a few
    ints, never the terms). A 100k-term list is a few MB broadcast; a
    mega-regex alternative blows up the codegen'd pattern and cannot
    be updated without recompiling the plan. NULL text produces zero
    tokens and is KEPT (no evidence of a hit — scrubbing NULLs is the
    gopher min-words filter's job, not the blocklist's).
    """
    tnorm = (terms.select(
        F.array_join(
            F.filter(
                F.transform(
                    F.split(F.trim(F.lower(F.col(term_col))), r"\s+"),
                    _blk_strip),
                lambda t: t != ""),
            " ").alias("__term"))
        .filter(F.col("__term") != "").dropDuplicates()
        .withColumn("__n", F.size(F.split(F.col("__term"), " "))))
    # bounded: distinct phrase LENGTHS only (ints), never the terms
    ns = sorted(r["__n"] for r in
                tnorm.select("__n").dropDuplicates().collect())
    base = df.select(
        F.col(id_col),
        F.filter(
            F.transform(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_col),
                                                  F.lit("")))),
                        r"\s+"),
                _blk_strip),
            lambda t: t != "").alias("__ts"))
    hit_frames = []
    for n in ns:
        cnt = F.size("__ts") - F.lit(n - 1)
        # guard: sequence(1, 0) infers a NEGATIVE step and yields
        # [1, 0] instead of [] — never build an empty range
        phrases = F.when(
            cnt >= 1,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_join(F.slice(F.col("__ts"), i, n),
                                       " "))
        ).otherwise(F.array().cast("array<string>"))
        hit_frames.append(
            base.select(id_col, F.explode(phrases).alias("__term"))
            .join(F.broadcast(tnorm.filter(F.col("__n") == n)
                              .select("__term")), "__term"))
    if hit_frames:
        all_hits = hit_frames[0]
        for h in hit_frames[1:]:
            all_hits = all_hits.unionByName(h)
        hits = (all_hits.groupBy(id_col)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"),
                     F.countDistinct("__term").cast("bigint")
                     .alias("n_distinct_terms"),
                     F.slice(F.array_sort(F.collect_set("__term")), 1,
                             max_terms_sample).alias("sample_terms")))
        out = df.select(id_col).join(hits, id_col, "left")
    else:  # empty blocklist: everything keeps
        out = df.select(
            id_col, F.lit(None).cast("bigint").alias("n_hits"),
            F.lit(None).cast("bigint").alias("n_distinct_terms"),
            F.lit(None).cast("array<string>").alias("sample_terms"))
    return out.select(
        id_col,
        F.col("n_hits").isNull().alias("keep"),
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.coalesce("n_distinct_terms", F.lit(0)).cast("bigint")
        .alias("n_distinct_terms"),
        F.coalesce("sample_terms", F.array().cast("array<string>"))
        .alias("sample_terms"))


def bigram_backoff_score(df: DataFrame, id_col: str, text_col: str,
                         ref_col: str, ref_value,
                         alpha: float = 0.5, backoff: float = 0.4
                         ) -> DataFrame:
    """CCNet-shaped out-of-domain scoring with a REFERENCE corpus:
    fit a bigram LM on the `ref_col == ref_value` slice (e.g. the
    English documents), then score EVERY document by Stupid Backoff
    (Brants et al. 2007): s(w2|w1) = cb(w1,w2)/cu(w1) when the bigram
    is attested in the reference, else backoff * p_add_alpha(w2). The
    per-doc average negative log-score separates in-domain text (low)
    from out-of-domain/other-language text (high, mostly backed off);
    backoff_frac is the exact fraction of backed-off bigram tokens.
    Documents with fewer than 2 tokens emit no row; an EMPTY reference
    slice yields an empty result (the scalar join key goes null).

    Scale shape (100 TB): the bigram explode is a Generate; reference
    counts and per-doc tf shuffle on the same (w1, w2) keys and
    equi-join; unigram lookups are token-keyed equi-joins; corpus
    scalars (N, V) ride the 1-row broadcast _join_scalar. No window,
    no cross join, no Python. Emitted double rounded to 6 (per-doc sum
    order differs across engines); backoff_frac is an exact int ratio.
    """
    from dbt_fusion_spark.llm.corpus import _join_scalar, tokens

    ref = df.filter(F.col(ref_col) == F.lit(ref_value))
    cu = (tokens(ref, id_col, text_col)
          .groupBy("token").agg(F.count("*").alias("__cu")))
    scalar = cu.agg(F.sum("__cu").alias("__N"), F.count("*").alias("__V"))

    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != "")
    bg_struct = ("transform(sequence(0, size(__w) - 2), i -> "
                 "named_struct('w1', element_at(__w, i + 1), "
                 "'w2', element_at(__w, i + 2)))")

    def _bigrams(frame: DataFrame) -> DataFrame:
        from dbt_fusion_spark.plans.partitioning import (
            ensure_parallelism,
        )

        return (ensure_parallelism(frame)
                .select(F.col(id_col), words.alias("__w"))
                .filter(F.size("__w") >= 2)
                .select(id_col, F.explode(F.expr(bg_struct)).alias("__b"))
                .select(id_col, F.col("__b.w1").alias("__w1"),
                        F.col("__b.w2").alias("__w2")))

    cb = (_bigrams(ref).groupBy("__w1", "__w2")
          .agg(F.count("*").alias("__cb")))
    tf = (_bigrams(df).groupBy(id_col, "__w1", "__w2")
          .agg(F.count("*").alias("__tf")))
    j = (tf.join(cb, ["__w1", "__w2"], "left")
         .join(cu.select(F.col("token").alias("__w1"),
                         F.col("__cu").alias("__cu1")), "__w1", "left")
         .join(cu.select(F.col("token").alias("__w2"),
                         F.col("__cu").alias("__cu2")), "__w2", "left"))
    j = _join_scalar(j, "__tf", scalar, "__N")
    p_uni2 = ((F.coalesce("__cu2", F.lit(0)) + F.lit(float(alpha)))
              / (F.col("__N") + F.lit(float(alpha)) * F.col("__V")))
    score = F.when(F.col("__cb").isNotNull(),
                   F.col("__cb") / F.col("__cu1")) \
        .otherwise(F.lit(float(backoff)) * p_uni2)
    return (
        j.groupBy(id_col)
        .agg(F.sum("__tf").cast("bigint").alias("n_bigrams"),
             F.sum(F.col("__tf") * F.log(score)).alias("__ll"),
             F.sum(F.when(F.col("__cb").isNull(), F.col("__tf"))
                   .otherwise(F.lit(0))).cast("bigint").alias("__nb"))
        .select(
            F.col(id_col), "n_bigrams",
            F.round(-F.col("__ll") / F.col("n_bigrams"), 6)
            .alias("avg_neg_loglik"),
            (F.col("__nb") / F.col("n_bigrams")).alias("backoff_frac"))
    )


def mojibake_signals(df: DataFrame, id_col: str, text_col: str,
                     flag_frac: float = 0.01) -> DataFrame:
    """Encoding-damage audit — the cheap pre-filter every web-crawl
    cleaning pipeline runs before spending tokens on broken text:
    per document, counts of (a) U+FFFD replacement characters (decoder
    already gave up), (b) C1 control characters U+0080-U+009F (almost
    always CP-1252 bytes mis-decoded as Latin-1), and (c) the classic
    UTF-8-read-as-Latin-1 mojibake markers ('\u00c3', '\u00e2\u20ac',
    '\u00c2') that survive re-encoding. Emits raw counts, the
    damaged-char fraction, and a keep boolean at `flag_frac`.

    Scale shape (100 TB): pure codegen'd regexp/length expressions in
    one projection — zero shuffles, zero UDFs, zero joins; the scan
    prunes to (id, text). The fraction is emitted as the RAW double of
    an integer division (bit-identical wherever IEEE doubles are) —
    never rounded, so no midpoint divergence (1/128-style ratios
    terminate on a 7th-decimal 5).
    """
    def _count(pat: str):  # occurrences of a regex in text
        return (F.size(F.split(F.col(text_col), pat)) - 1).cast("bigint")

    n_chars = F.length(text_col).cast("bigint")
    n_repl = _count("\uFFFD")
    n_c1 = _count("[\u0080-\u009F]")
    n_moji = _count("\u00c3|\u00e2\u20ac|\u00c2")
    bad = n_repl + n_c1 + n_moji
    frac = F.when(n_chars > 0, bad.cast("double") / n_chars.cast("double")) \
        .otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_c1.alias("n_c1_controls"),
        n_moji.alias("n_mojibake_seqs"),
        frac.alias("damaged_frac"),
        (frac <= F.lit(float(flag_frac))).alias("keep"),
    )


def ccnet_perplexity_buckets(df: DataFrame, id_col: str, text_col: str,
                             alpha: float = 0.5,
                             n_buckets: int = 3) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    document with the corpus-fit unigram LM (unigram_loglik — the
    in-engine KenLM stand-in), then bucket documents into `n_buckets`
    equal-population perplexity tiers: bucket 1 = most-typical text
    (head, what CCNet keeps), bucket n = rare-token soup (tail). The
    table an LLM-data curriculum samples from.

    Scale shape: scoring is unigram_loglik's two token-keyed shuffles;
    the bucket assignment is the integer-exact cumulative walk over
    the (score -> count) distribution grid (the rfm_scores machinery:
    ceil(n_buckets * cume / n) in pure integer arithmetic). CAVEAT
    (same as RFM's monetary grid): round-6 scores are near-unique, so
    the grid is ~doc-cardinality and its cumulative window is a
    single-reducer sort over the PER-DOC table — petabytes of text
    reduce to one row per document first; bucket boundaries
    fundamentally need a global order.
    """
    from pyspark.sql import Window

    scored = unigram_loglik(df, id_col, text_col, alpha=alpha)
    scored = scored.localCheckpoint(eager=True)  # feeds grid + join
    n = scored.count()
    dist = scored.groupBy("avg_neg_loglik").agg(
        F.count(F.lit(1)).alias("__c"))
    w = (Window.orderBy("avg_neg_loglik")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dist.withColumn("__cum", F.sum("__c").over(w))
    score = F.expr(
        f"CAST(({int(n_buckets)} * __cum + {n} - 1) DIV {n} AS INT)")
    return (scored.join(cum.select("avg_neg_loglik", "__cum"),
                        "avg_neg_loglik")
            .select(id_col, "n_tokens", "avg_neg_loglik",
                    score.alias("ppl_bucket")))


# --------------------------------------------------------- mojibake repair
# The 27 CP-1252 printable characters that occupy the C1 control block
# 0x80-0x9F (byte order), and their C1 equivalents -- the ftfy
# "sloppy-windows-1252" table: text mis-decoded as CP-1252 shows these
# PRINTABLE marks where Latin-1 mis-decoding shows C1 controls, so
# translating them back first lets one Latin-1 re-encode serve both.
_CP1252_PRINTABLE = ("\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6"
                     "\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c"
                     "\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a"
                     "\u0153\u017e\u0178")
_CP1252_AS_C1 = ("\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a\x8b\x8c"
                 "\x8e\x91\x92\x93\x94\x95\x96\x97\x98\x99\x9a\x9b"
                 "\x9c\x9e\x9f")

# UTF-8-looking byte sequences viewed as Latin-1 characters: the
# smoking gun that a string is mojibake ('\u00c3\u00a9' for '\u00e9',
# '\u00e2' + C1 pair for a curly quote).  Shared with the oracle
# restatement (demo side rebuilds the same pattern from these bounds).
UTF8ISH_SEQ = ("[\u00c2-\u00df][\u0080-\u00bf]"
               "|[\u00e0-\u00ef][\u0080-\u00bf]{2}"
               "|[\u00f0-\u00f4][\u0080-\u00bf]{3}")

# Full RFC 3629 UTF-8 grammar over chars-as-bytes (excludes overlong
# encodings, UTF-16 surrogates, and > U+10FFFF): a string matching
# this END TO END re-encodes to Latin-1 bytes that decode as UTF-8
# with zero error handling -- the guard that lets F.decode run without
# ever seeing malformed input (Spark 4 raises on malformed; there is
# no try_decode).
_VALID_UTF8_AS_LATIN1 = (
    "^(?:[\u0000-\u007f]"
    "|[\u00c2-\u00df][\u0080-\u00bf]"
    "|\u00e0[\u00a0-\u00bf][\u0080-\u00bf]"
    "|[\u00e1-\u00ec][\u0080-\u00bf]{2}"
    "|\u00ed[\u0080-\u009f][\u0080-\u00bf]"
    "|[\u00ee-\u00ef][\u0080-\u00bf]{2}"
    "|\u00f0[\u0090-\u00bf][\u0080-\u00bf]{2}"
    "|[\u00f1-\u00f3][\u0080-\u00bf]{3}"
    "|\u00f4[\u0080-\u008f][\u0080-\u00bf]{2})*$")


def repair_mojibake(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repair UTF-8-as-Latin-1/CP-1252 mojibake -- the fixing half of
    the mojibake_signals audit (which only detects).  The ftfy-style
    reverse transform: map CP-1252 printables back to the C1 block,
    re-encode as Latin-1 (identity on code points <= 0xFF), decode the
    bytes as UTF-8.

    A row is repaired ONLY when all three hold on the translated text:
    (a) it contains at least one UTF-8-looking sequence (there is
    damage to fix), (b) every char is <= 0xFF (a genuine non-Latin
    char means mixed content the re-encode would corrupt -- skipped,
    honestly, rather than guessed at), and (c) the whole string
    matches the strict UTF-8 grammar viewed as Latin-1 chars (the
    decode is then total -- no error handling, no replacement chars).
    Everything else passes through byte-identical, `was_repaired`
    false.

    Emits (id, repaired, was_repaired, n_utf8ish_after) -- the counter
    dropping to zero on a damaged corpus is the gate's evidence.

    Scale shape (100 TB): translate + three regexps + encode/decode
    are all codegen'd string expressions in ONE projection -- zero
    shuffles, zero UDFs, zero joins; the scan prunes to (id, text).
    """
    t = F.col(text_col)
    c1 = F.translate(t, _CP1252_PRINTABLE, _CP1252_AS_C1)
    do = (c1.rlike(UTF8ISH_SEQ)
          & ~c1.rlike("[^\u0000-\u00ff]")
          & c1.rlike(_VALID_UTF8_AS_LATIN1))
    repaired = F.when(do, F.decode(F.encode(c1, "ISO-8859-1"), "UTF-8")) \
        .otherwise(t)
    out = df.select(F.col(id_col), repaired.alias("repaired"),
                    do.alias("was_repaired"))
    n_after = (F.size(F.split(F.col("repaired"), UTF8ISH_SEQ)) - 1) \
        .cast("bigint")
    return out.select(id_col, "repaired", "was_repaired",
                      n_after.alias("n_utf8ish_after"))


def readability_scores(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade per document — the
    classic readability pair every curation pipeline reports next to
    its quality score (training mixes tune on grade-level bands).

    Counts are pure regexp estimates, deterministic and restatable:
    words = whitespace runs, sentences = terminal-punctuation runs
    ([.!?]+, floor 1), syllables = vowel groups ([aeiouy]+ in the
    lowercased text — the standard cheap estimator).  Scores:

        ease  = 206.835 - 1.015 W/S - 84.6 Y/W
        grade = 0.39 W/S + 11.8 Y/W - 15.59

    Empty docs emit NULLs.  One codegen'd projection: zero shuffles,
    zero UDFs, scan prunes to (id, text).
    """
    def _count(pat: str):
        return (F.size(F.split(F.col(text_col), pat)) - 1) \
            .cast("bigint")

    words = (F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
             .cast("bigint"))
    words = F.when(F.trim(F.col(text_col)) == "", F.lit(0)) \
        .otherwise(words)
    sents = F.greatest(_count(r"[.!?]+"), F.lit(1).cast("bigint"))
    sylls = (F.size(F.split(F.lower(F.col(text_col)), "[aeiouy]+")) - 1) \
        .cast("bigint")
    ws = words.cast("double") / sents.cast("double")
    yw = sylls.cast("double") / words.cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * ws - F.lit(84.6) * yw
    grade = F.lit(0.39) * ws + F.lit(11.8) * yw - F.lit(15.59)
    ok = words > 0
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
        F.when(ok, F.round(ease, 6)).alias("flesch_ease"),
        F.when(ok, F.round(grade, 6)).alias("fk_grade"))
