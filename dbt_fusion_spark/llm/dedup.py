"""Deduplication operators for LLM training-data pipelines.

Beyond-reference surface (BASELINE.json north star): exact dedup,
MinHash+LSH, SimHash, and n-gram Jaccard verification, all as
declarative DataFrame transforms (no UDFs — every hash is md5/bit
arithmetic inside whole-stage codegen).

Scale design (100 TB):
- exact_dedup: one hash shuffle on the key columns (partial distinct
  map-side first).
- MinHash LSH: per-band band-value self-join — candidate generation is
  O(collisions), never the O(n²) cross join; band buckets are the join
  keys so AQE handles skewed buckets (e.g. boilerplate-heavy shards).
- SimHash: token explode + 32 conditional sums per doc = one shuffle.
- Jaccard: computed only on LSH candidates, arrays kept pre-tokenized.

The md5-based MinHash family (min over md5(seed || shingle)) is a
classic permutation approximation; salts b0..b{k} give independent
bands. Everything is reproducible across engines — the DuckDB oracles
restate each step with list_* functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _norm(text_col) -> Column:
    return F.regexp_replace(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col), r"\s+", " ")


def shingle_array(text_col: str, n: int = 5) -> Column:
    norm = _norm(text_col)
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(regexp_replace(lower({text_col}),"
            f" '\\\\s+', ' ')) - {n - 1}, 1)),"
            f" i -> substring(regexp_replace(lower({text_col}), '\\\\s+', ' '), i, {n}))"
        )
    )


def exact_dedup(df: DataFrame, keys: list[str], tie_breaker: str) -> DataFrame:
    """Exact dedup: one representative per key group — the row with the
    minimal tie_breaker (deterministic, unlike dropDuplicates)."""
    w = Window.partitionBy(*keys).orderBy(F.col(tie_breaker))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_bands(df: DataFrame, id_col: str, text_col: str,
                  n_bands: int = 4, rows_per_band: int = 4,
                  shingle_n: int = 5) -> DataFrame:
    """Banded MinHash signature (classic b×r LSH): band j's value is the
    concat of r independent minhashes (salt 'b{j*r+i}|'); two docs
    collide on a band with probability J^r, giving the standard
    (1-(1-J^r)^b) S-curve. Returns (id, band_id, band_value) long form
    ready for bucketing."""
    sh = shingle_array(text_col, shingle_n).alias("__sh")
    base = df.select(F.col(id_col), sh)

    def salted_min(salt: str) -> Column:
        # NB: the lambda must be single-arg — a second arg would be
        # interpreted by F.transform as the array index.
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: F.md5(F.concat(F.lit(salt), s)))
        )

    bands = []
    for j in range(n_bands):
        parts = [
            salted_min(f"b{j * rows_per_band + i}|") for i in range(rows_per_band)
        ]
        bands.append(
            base.select(
                id_col,
                F.lit(j).alias("band_id"),
                F.concat_ws("", *parts).alias("band_value"),
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n_bands: int = 4, rows_per_band: int = 4,
                        shingle_n: int = 5) -> DataFrame:
    """Near-dup candidates: pairs sharing ANY minhash band. The join is
    per-(band_id, band_value) bucket — never all-pairs."""
    bands = minhash_bands(df, id_col, text_col, n_bands, rows_per_band, shingle_n)
    a = bands.select(F.col(id_col).alias("id_a"), "band_id", "band_value")
    b = bands.select(F.col(id_col).alias("id_b"), "band_id", "band_value")
    return (
        a.join(b, ["band_id", "band_value"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
                  shingle_n: int = 5) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (the verify step after
    LSH): |A ∩ B| / |A ∪ B| over distinct shingle sets."""
    sh = df.select(F.col(id_col), shingle_array(text_col, shingle_n).alias("__sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return joined.select(
        "id_a", "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


_HEX = "0123456789abcdef"


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash via hex-nibble voting, pure SQL arithmetic:

    For token t, md5(t) hex chars 1..8 give 8 nibbles = 32 bits. Bit j
    of the doc hash is the majority vote of bit j over its (distinct)
    tokens. instr() maps a hex char to its value in both engines, so the
    whole computation is oracle-reproducible."""
    toks = F.array_distinct(
        F.filter(F.split(_norm(text_col), " "), lambda x: x != F.lit(""))
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("__tok"))
    h = F.md5(F.col("__tok"))
    bit_sums = []
    for pos in range(8):  # hex positions 1..8
        nib = F.instr(F.lit(_HEX), F.substring(h, pos + 1, 1)) - 1
        for b in range(4):
            j = pos * 4 + b
            bit = F.floor(nib / (2 ** b)) % 2
            bit_sums.append(F.sum(bit).alias(f"__s{j}"))
    agg = exploded.groupBy(id_col).agg(F.count("*").alias("__n"), *bit_sums)
    hash_expr = None
    for j in range(32):
        bit_set = (F.col(f"__s{j}") * 2 > F.col("__n")).cast("long") * (2 ** j)
        hash_expr = bit_set if hash_expr is None else (hash_expr + bit_set)
    return agg.select(F.col(id_col), hash_expr.alias("simhash32"))
