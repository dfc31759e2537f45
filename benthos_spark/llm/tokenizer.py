"""Byte-pair encoding tokenizer: train on a corpus sample, apply at
scale as an Arrow-batched kernel.

Clean-room implementation of the public BPE algorithm (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units";
the GPT-2 tokenizer applies the same merge-rank greedy loop).  Training
is driver-side over a bounded sample (the standard practice — vocabs
are built once, shipped everywhere); encoding is a pandas UDF whose
per-word results are memoized, so the per-batch cost is proportional to
the DISTINCT words in the batch (Zipf makes that a small fraction).

Scale shape: apply is map-only (one Arrow-batched projection, no
shuffle); the merge table rides along as a broadcast-sized plan literal
(~vocab_size entries).
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer shape: words / numbers / single punctuation
_PRETOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

_END = "</w>"  # end-of-word marker so merges can't cross words


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _END,)


def bpe_train(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn `n_merges` merge rules from a text sample: repeatedly merge
    the most frequent adjacent symbol pair (ties broken lexicographically
    for determinism).  O(n_merges · distinct_words) — run on a bounded
    driver-side sample, never the full corpus."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in _PRETOK.findall(t):
            words[w] += 1
    seqs: dict[str, list[str]] = {w: list(_word_symbols(w)) for w in words}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b))
        ab = a + b
        for w in words:
            s = seqs[w]
            i = 0
            out = []
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def _encoder(merges: list[tuple[str, str]]):
    """Greedy merge-rank encoder for one word (the public BPE apply
    loop): repeatedly merge the lowest-rank adjacent pair present."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @lru_cache(maxsize=65536)
    def encode_word(word: str) -> tuple[str, ...]:
        s = list(_word_symbols(word))
        while len(s) > 1:
            best_rank, best_i = None, -1
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            s[best_i:best_i + 2] = [s[best_i] + s[best_i + 1]]
        return tuple(s)

    return encode_word


def bpe_encode_batch(texts, merges: list[tuple[str, str]]):
    """Encode an iterable of strings → list of token lists (pure
    Python; exposed for tests and for the pandas-UDF body)."""
    enc = _encoder(merges)
    out = []
    for t in texts:
        toks: list[str] = []
        for w in _PRETOK.findall(t or ""):
            toks.extend(enc(w))
        out.append(toks)
    return out


def bpe_token_count(df: DataFrame, merges: list[tuple[str, str]],
                    text: str = "text", id_col: str = "doc_id",
                    with_tokens: bool = False) -> DataFrame:
    """Per-document BPE token count (and optionally the token strings):
    one Arrow-batched map-only projection.  The real token-budget
    signal for packing/pricing, vs the bpe_ish regex approximation in
    llm.text (kept as the zero-Python fast path)."""
    import pandas as pd

    id_t = df.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_t}, n_bpe_tokens long, bpe_tokens array<string>"
              if with_tokens else f"{id_col} {id_t}, n_bpe_tokens long")

    def run(batches):
        for pdf in batches:
            toks = bpe_encode_batch(pdf[text].tolist(), merges)
            out = {id_col: pdf[id_col],
                   "n_bpe_tokens": [len(t) for t in toks]}
            if with_tokens:
                out["bpe_tokens"] = toks
            yield pd.DataFrame(out)

    return df.select(id_col, text).mapInPandas(run, schema=schema)


def train_from_frame(df: DataFrame, text: str = "text",
                     sample: int = 2000, n_merges: int = 200,
                     id_col: str = "doc_id") -> list[tuple[str, str]]:
    """Bounded-sample trainer: takes the `sample` smallest ids (a
    deterministic sample — NOT .limit(), which is partition-order
    dependent) and learns merges driver-side."""
    rows = (df.select(F.col(id_col), F.col(text))
            .orderBy(id_col).limit(sample).collect())
    return bpe_train([r[text] for r in rows], n_merges)
