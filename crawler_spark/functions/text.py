"""Text-analysis primitives for the training-data pipeline.

Everything here is pure Catalyst (no Python UDFs): token counting,
quality scoring, language-ID, document fingerprinting, shingling,
MinHash, SimHash. Each primitive has an exactly-equivalent ANSI-SQL
formulation (used as the DuckDB oracle in ``plans/queries.py``), so the
SPEC below is normative — both implementations follow it literally.

SPEC (shared with the SQL oracles — change both or neither):
- tokens(text)      = regexp matches of ``[a-z0-9]+`` over lower(text)
- chars(s)          = regexp matches of ``[\\s\\S]`` over s (every char)
- poly_hash(s)      = left fold over chars(s):
                      acc' = (acc*131 + codepoint(char)) mod 2147483647,
                      acc0 = 0  (codepoint = ascii() in both engines)
- shingles_k(text)  = k-grams of tokens joined by one space, k=3
- minhash_i(doc)    = min over shingle hashes h of
                      (A_i*h + B_i) mod 2147483647, i in 0..7
- simhash32(doc)    = bit b set iff sum over token hashes h of
                      (+1 if floor(h / 2^b) mod 2 = 1 else -1) > 0
- quality           = see quality_cols docstring

At 100 TB these run inside whole-stage codegen; the only shuffles are
the explicit groupBys of the queries that use them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 2147483647  # 2^31 - 1 (Mersenne prime)
BASE = 131

# 8 fixed minhash permutations (a odd, declared constants so the SQL
# oracle can embed the same literals)
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (1103515245, 12345),
    (214013, 2531011),
    (69069, 1234567),
    (1664525, 1013904223),
    (22695477, 1),
    (134775813, 7),
    (1099087573, 29),
    (48271, 101),
)

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in")
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "y"),
    "fr": ("le", "les", "et"),
}


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def chars(s: Column) -> Column:
    return F.regexp_extract_all(s, F.lit(r"[\s\S]"), 0)


def poly_hash(s: Column) -> Column:
    """Rolling polynomial hash of a string (the document-fingerprint /
    token-hash primitive). Runs as a Catalyst higher-order aggregate —
    no Python, no shuffle."""
    return F.aggregate(
        chars(s),
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * F.lit(BASE) + F.ascii(c), F.lit(MOD)),
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-token shingles as strings; empty array when fewer than k tokens."""
    t = tokens(text)
    n = F.size(t)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def minhash_col(shingle_hashes: Column, perm: int) -> Column:
    a, b = MINHASH_PERMS[perm]
    return F.array_min(
        F.transform(
            shingle_hashes,
            lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MOD)),
        )
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    t = tokens(text)
    return F.size(F.filter(t, lambda x: x.isin(*words)))


def quality_cols(text: Column) -> dict[str, Column]:
    """Quality features + score. Score formula (normative):
    0.4*least(1, n_tokens/100) + 0.3*(1 - punct_ratio)
    + 0.3*least(1, 4*stopword_ratio), rounded to 6 dp.
    punct_ratio = non-[a-z0-9 ] chars / chars of lower(text);
    stopword_ratio = EN stopword hits / n_tokens (0 if no tokens)."""
    n_tok = token_count(text).cast("double")
    n_chars = F.length(text).cast("double")
    n_punct = F.size(F.regexp_extract_all(F.lower(text), F.lit("[^a-z0-9 ]"), 0)).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, stopword_hits(text).cast("double") / n_tok).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(4.0) * sw_ratio)
    )
    return {
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(sw_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def gopher_cols(text: Column) -> dict[str, Column]:
    """Gopher-style quality-rule flags (Rae et al. 2021, scaled to the
    synthetic corpus). Normative spec, mirrored verbatim in the DuckDB
    oracle:

    - ok_n_tokens:      10 <= n_tokens <= 100000
    - ok_mean_word_len: 3 <= sum(len(tok))/n_tokens <= 10
    - ok_symbol_ratio:  (count('#') + count('...')) / n_tokens <= 0.1
    - ok_alpha_words:   tokens containing [a-z] / n_tokens >= 0.8
    - ok_stopwords:     EN stopword hits >= 2
    - keep: all of the above; zero-token docs fail every ratio rule.

    All flags are 0/1 ints (not booleans) so the oracle hash compare is
    dtype-stable. Pure Catalyst — one projection, no shuffle, no UDF."""
    t = tokens(text)
    n_tok = F.size(t).cast("double")
    sum_len = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ).cast("double")
    mwl = F.when(n_tok > 0, sum_len / n_tok).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    sym_ratio = F.when(
        n_tok > 0, (n_hash + n_ellipsis).cast("double") / n_tok
    ).otherwise(F.lit(1.0))
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double")
    alpha_frac = F.when(n_tok > 0, n_alpha / n_tok).otherwise(F.lit(0.0))
    flags = {
        "ok_n_tokens": (n_tok >= 10) & (n_tok <= 100000),
        "ok_mean_word_len": (n_tok > 0) & (mwl >= 3) & (mwl <= 10),
        "ok_symbol_ratio": (n_tok > 0) & (sym_ratio <= 0.1),
        "ok_alpha_words": (n_tok > 0) & (alpha_frac >= 0.8),
        "ok_stopwords": stopword_hits(text) >= 2,
    }
    keep = None
    for f in flags.values():
        keep = f if keep is None else (keep & f)
    out = {
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": F.round(mwl, 6),
        "symbol_ratio": F.round(sym_ratio, 6),
        "alpha_word_frac": F.round(alpha_frac, 6),
    }
    out.update({k: v.cast("int") for k, v in flags.items()})
    out["keep"] = keep.cast("int")
    return out


def langid_col(text: Column) -> Column:
    """n-gram-free marker-word language ID; ties resolve in the fixed
    order en > de > es > fr, no hits => 'und'."""
    t = tokens(text)
    counts = {
        lang: F.size(F.filter(t, lambda x: x.isin(*words)))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    out = F.when(best == 0, F.lit("und"))
    for lang in ("en", "de", "es", "fr"):
        out = out.when(counts[lang] == best, F.lit(lang))
    return out


def simhash32(text: Column) -> Column:
    """32-bit SimHash over token poly-hashes (multiplicity counts).
    Pure array algebra — for the grouped/exploded variant used at scale
    see queries.py (explode keeps it shuffle-parallel)."""
    tok_hashes = F.transform(tokens(text), lambda t: poly_hash_str(t))
    bits = F.sequence(F.lit(0), F.lit(31))
    return F.aggregate(
        bits,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.aggregate(
                tok_hashes,
                F.lit(0).cast("long"),
                lambda s, h: s
                + F.when(
                    F.pmod(F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long"), F.lit(2)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            )
            > 0,
            F.floor(F.pow(F.lit(2.0), b.cast("double"))).cast("long"),
        ).otherwise(F.lit(0)),
    )


def poly_hash_str(s: Column) -> Column:
    """poly_hash for a single token (alias, kept for call-site clarity)."""
    return poly_hash(s)
