"""Text analysis operators over document tables.

All pure Column expressions (JVM codegen, no Python UDFs) so they run at
scan speed over 100 TB — the per-document cost is a few regexes and an
array fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne-ish prime keeps the polynomial fold inside int64 under ANSI
# arithmetic (max acc*31+255 < 2^35) in Spark AND DuckDB (oracle).
HASH_PRIME = 1_000_000_007

_STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it",
              "that", "for", "on", "with", "as", "at", "by"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish regex token count: words, numbers, and single
    punctuation marks counted separately (GPT-2-style pre-tokenizer
    shape, public regex idiom)."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def char_hash(token: Column) -> Column:
    """Portable polynomial hash of a string: fold (acc*31 + ascii(char))
    mod HASH_PRIME.  Chosen over xxhash64 where cross-engine
    reproducibility matters (oracle checks); xxhash64 remains the
    fast path for engine-internal keys."""
    return F.aggregate(
        F.split(token, ""), F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % HASH_PRIME)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: rolling polynomial hash over whitespace
    tokens — order-sensitive, so re-ordered documents differ (unlike a
    bag-of-words hash)."""
    return F.aggregate(
        tokens(text), F.lit(0).cast("long"),
        lambda acc, tok: (acc * 131 + char_hash(tok)) % HASH_PRIME)


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are English stopwords."""
    toks = F.transform(tokens(text), F.lower)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    return F.when(n > 0, sw.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + healthy
    stopword presence + low punctuation noise.  Weights are the usual
    public-recipe shape (Gopher/C4-style length & symbol filters)."""
    n_tok = token_count(text).cast("double")
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    punct = punct_ratio(text)
    punct_ok = F.when(punct <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((0.4 * len_ok + 0.4 * sw_ok + 0.2 * punct_ok), 6)


# tiny per-language marker lexicons for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "ist"],
}


def lang_id(text: Column, default: str = "unknown") -> Column:
    """Language ID via marker-word hit counts (n-gram heuristic — the
    classic fastText-free fallback).  Returns the language with the most
    marker hits; ties broken by language-code order for determinism."""
    toks = F.transform(tokens(text), F.lower)

    def marker_hits(words: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    scores = [(lang, marker_hits(words))
              for lang, words in sorted(_LANG_MARKERS.items())]
    best = None
    best_score = F.lit(0)
    for lang, score in scores:
        best_score = F.greatest(best_score, score)
    expr = F.lit(default)
    for lang, score in reversed(scores):
        expr = F.when((score == best_score) & (best_score > 0),
                      F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------- PII scrub

# Patterns stay in the RE2 ∩ java.util.regex common subset (no
# lookaround) so the DuckDB oracle can run the identical regexes.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,14}\d\b", "<PHONE>"),
    ("cc", r"\b(?:\d{4}[ -]){3}\d{4}\b", "<CC>"),
)


def scrub_pii(text: Column) -> Column:
    """Redact PII spans (training-data hygiene pass). Order matters:
    credit cards before phones (a CC is also a phone-shaped digit run);
    emails before IPs never conflict but keep one canonical order."""
    out = text
    for name in ("email", "cc", "phone", "ipv4"):
        pat, rep = next((p, r) for n, p, r in PII_PATTERNS if n == name)
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (pre-redaction), for audit metrics."""
    return {name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
            for name, pat, _ in PII_PATTERNS}
