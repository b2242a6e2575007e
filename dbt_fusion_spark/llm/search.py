"""Corpus keyword-search primitives: inverted index + BM25 top-k.

Beyond-reference extensions (same family as llm/corpus.py): a
training-data pipeline needs targeted corpus probes — "find documents
mentioning X" for audit/curation — without an external search service.
Both operators are pure DataFrame algebra over the shared whitespace
tokenizer (corpus.tokens):

- inverted_index: (token, postings[], df) — postings sorted for
  determinism. High-frequency terms are the scale hazard (a stopword's
  posting list is O(corpus)); max_df prunes them, the standard IR move.
- bm25_topk: classic Okapi BM25 (public formula; Robertson & Walker)
  for a literal query-term list. The term filter is an `isin` pushed to
  the scan side of the token explode, so only rows for query terms ever
  aggregate; corpus stats (N, avgdl) ride the 1-row broadcast-hash
  scalar join from corpus._join_scalar. Scores round(9) — the ranking
  itself ties-breaks on integers/ids, the float is for consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbt_fusion_spark.llm.corpus import _join_scalar, tokens


def inverted_index(df: DataFrame, id_col: str, text_col: str,
                   max_df: int | None = None) -> DataFrame:
    """(token, postings, df): sorted distinct doc ids per token.

    One shuffle on token (the distinct fuses into the aggregate).
    max_df drops terms appearing in more than max_df docs — unbounded
    posting lists for stopword-like terms are the 100 TB failure mode;
    real deployments always prune or tier them.
    """
    tok = tokens(df, id_col, text_col).distinct()
    idx = tok.groupBy("token").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
        F.count("*").cast("bigint").alias("df"),
    )
    if max_df is not None:
        idx = idx.filter(F.col("df") <= max_df)
    return idx


def bm25_topk(df: DataFrame, query_terms: list[str], id_col: str,
              text_col: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents for a bag-of-terms query by Okapi BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (the non-negative
    Lucene variant). Deterministic output: ties break on doc id.

    Shape: the `isin` term filter reaches the exploded token stream, so
    tf/df aggregate only query-term rows (|terms| · matching docs, not
    the corpus); doc lengths are one narrow aggregate; N and avgdl are
    a 1-row scalar join; final top-k is a TakeOrdered over scored docs.
    """
    tok = tokens(df, id_col, text_col)
    doc_len = tok.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("__dl"))
    # avgdl as exact-integer sum / count: float summation order differs
    # between engines (and between partitionings!), so avg(double)
    # would drift; bigint sum is exact and the single final division is
    # IEEE-identical everywhere.
    stats = doc_len.agg(
        F.count("*").cast("bigint").alias("__n"),
        F.sum("__dl").cast("bigint").alias("__sumdl"))
    qtok = tok.filter(F.col("token").isin(list(query_terms)))
    tf = qtok.groupBy(id_col, "token").agg(
        F.count("*").cast("double").alias("__tf"))
    dfreq = tf.groupBy("token").agg(
        F.count("*").cast("double").alias("__df"))
    scored = (
        _join_scalar(tf.join(dfreq, "token"), "__tf", stats, "__n")
        .join(doc_len, id_col)
        .withColumn("__avgdl", F.col("__sumdl") / F.col("__n"))
        .withColumn(
            "__idf",
            F.log((F.col("__n") - F.col("__df") + 0.5)
                  / (F.col("__df") + 0.5) + 1.0))
        .withColumn(
            "__s",
            F.col("__idf") * F.col("__tf") * (k1 + 1.0)
            / (F.col("__tf")
               + k1 * (1.0 - b
                       + b * F.col("__dl").cast("double")
                       / F.col("__avgdl"))))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("__s"), 9).alias("bm25"),
             F.count("*").cast("bigint").alias("n_terms_matched"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def positional_postings(df: DataFrame, id_col: str, text_col: str
                        ) -> DataFrame:
    """(token, doc, pos) positional postings — the index phrase search
    serves from. posexplode keeps 0-based word positions; tokens are
    lowercased whitespace words (the corpus tokenizer used by the
    inverted index). One Generate, no shuffle until a consumer keys it;
    ensure_parallelism splits the single-row-group local scan (a no-op
    on properly-chunked fleet parquet).
    """
    from dbt_fusion_spark.plans.partitioning import ensure_parallelism

    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (ensure_parallelism(df)
            .select(F.col(id_col).alias("doc"),
                    F.posexplode(words).alias("pos", "token"))
            .filter(F.col("token") != ""))


def phrase_search(df: DataFrame, phrases: list[str], id_col: str,
                  text_col: str) -> DataFrame:
    """Exact-phrase search over positional postings: a phrase of n
    words matches where postings for word_i co-occur in one doc at
    pos_i = pos_1 + (i-1). Returns (phrase, doc_id, n_matches), one row
    per document containing the phrase at least once.

    Scale shape (100 TB): the postings table is built ONCE per call for
    all phrases (one Generate over the corpus); each phrase's match is
    a chain of equi-joins on (doc, pos) between tiny token-filtered
    slices of it — the filters push the token predicate into the scan,
    so a phrase touches only its own terms' postings, never the corpus.
    Joins are equi (doc, pos arithmetic on the join key); no window, no
    cross join. Multi-phrase results union cheaply (same scan subtree,
    reused by Spark's plan cache under AQE).
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    post = positional_postings(df, id_col, text_col)
    outs = []
    for phrase in phrases:
        terms = [t for t in phrase.strip().lower().split() if t]
        if not terms:
            raise ValueError(f"empty phrase in {phrases!r}")
        m = (post.filter(F.col("token") == terms[0])
             .select("doc", F.col("pos").alias("p0")))
        for i, t in enumerate(terms[1:], start=1):
            nxt = (post.filter(F.col("token") == t)
                   .select("doc", (F.col("pos") - i).alias("p0")))
            m = m.join(nxt, ["doc", "p0"])
        outs.append(
            m.groupBy("doc")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
            .select(F.lit(phrase).alias("phrase"),
                    F.col("doc").alias("doc_id"), "n_matches"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
