"""Byte-pair-encoding tokenizer: bounded driver-side train, Arrow encode.

The token-count estimate in llm/text.py (BPE-ish regex) is the cheap
column-expression path; this module is the real thing for when exact
token ids matter (sequence packing budgets, context-length filtering,
per-token pricing). Same architecture contract as the IVF k-means fit
(llm/similarity.py): the LEARNED artifact is fit deterministically on a
bounded sample on the driver, and the APPLY side is distributed —
here an Arrow-batched mapInPandas, never a row-at-a-time Python UDF.

Classic Sennrich et al. 2016 char-level BPE with an end-of-word marker:
lossless (decode == normalized text), deterministic (ties break
lexicographically), and the merge table is a plain list of string
pairs — portable, versionable, diffable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def _words(text: str) -> list[str]:
    return text.lower().split()


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 200,
              sample_n: int = 2000) -> list[tuple[str, str]]:
    """Learn `n_merges` merges from a deterministic bounded sample.

    The sample is the first `sample_n` rows in ascending order of the
    text itself (not physical order), so the fit is a pure function of
    the data — rerunning on a re-partitioned corpus yields the same
    merge table. Driver-side cost is O(sample vocab), independent of
    corpus size."""
    rows = (df.select(F.col(text_col).alias("t"))
              .filter(F.col("t").isNotNull())
              .orderBy("t").limit(sample_n).collect())
    word_freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        for w in _words(r["t"]):
            key = tuple(list(w) + [EOW])
            word_freq[key] = word_freq.get(key, 0) + 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, freq in word_freq.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # deterministic: max frequency; ties broken by the negated
        # char-ordinal sequence of "a\x00b" — elementwise-smallest
        # string wins, except a strict prefix loses to its extension
        # (('a','bc') beats ('a','b')). Any fixed total order works;
        # this one is kept for golden-stability.
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(c) for c in
                                                          "\x00".join(kv[0])]))
        pair, freq = best
        if freq < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, f0 in word_freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + f0
        word_freq = nxt
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — Arrow-batched apply.

    The merge table broadcasts inside the closure (a few KB); encoding
    caches per unique word within each Arrow batch, so the per-row cost
    collapses on natural-language zipf distributions. mapInPandas keeps
    the python boundary vectorized (SURVEY §2.10 contract: no
    BatchEvalPython in any hot path)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # the id column keeps its incoming type (string/decimal ids would
    # hit Arrow conversion errors if 'long' were hardcoded)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, tokens array<string>, n_tokens long"

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, lens = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in _words(t or ""):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(i)
                toks.append(out)
                lens.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "tokens": toks, "n_tokens": lens})

    return (df.select(id_col, text_col)
              .mapInPandas(run, schema=schema))


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of encode for one document's token list (lossless on the
    normalized text): join symbols, split words on the EOW marker."""
    return " ".join(w for w in "".join(tokens).split(EOW) if w)
