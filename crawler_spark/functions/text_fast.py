"""Arrow fast paths for the text-hash primitives.

``functions/text.py`` defines the normative SPEC as pure Catalyst
expressions — ideal for auditability and for the DuckDB oracles, but
Spark's higher-order functions (aggregate/transform) are *interpreted*
per element, which makes the char-fold hashing ~7ms/doc. These
pandas UDFs compute the SAME values (bit-identical — asserted in
tests/test_text_fast.py) with numpy:

poly_hash(s) = fold (acc*B + c) mod M  ==  Σ c_i · B^(n-1-i) mod M,
computed exactly in int64: each term (c_i · (B^j mod M)) mod M < 2^38,
so a 100k-char document's term sum stays far below 2^63 — no float, no
overflow, bit-equal to the stepwise fold.

The queries use these fast paths; the oracles and the parity tests pin
them to the spec.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import BASE, MINHASH_PERMS, MOD

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# B^j mod M for j up to the longest string we expect in one value
_MAX_LEN = 1 << 20
_POW: np.ndarray | None = None


def _pows(n: int) -> np.ndarray:
    global _POW
    if _POW is None or len(_POW) < n:
        size = max(n, 4096)
        p = np.empty(size, dtype=np.int64)
        p[0] = 1
        filled = 1
        while filled < size:  # doubling: p[f+i] = p[i] * p[f] (mod M)
            step = min(filled, size - filled)
            p_f = (p[filled - 1] * BASE) % MOD
            p[filled : filled + step] = (p[:step] * p_f) % MOD
            filled += step
        _POW = p
    return _POW


def poly_hash_py(s: str) -> int:
    """Exact spec value via numpy (codepoints = ascii() semantics)."""
    if not s:
        return 0
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = len(codes)
    pw = _pows(n)[:n][::-1]
    terms = (codes * pw) % MOD  # codes < 2^21, pw < 2^31 → exact in int64
    return int(terms.sum() % MOD)


def tokens_py(s: str) -> list[str]:
    return _TOKEN_RE.findall(s.lower())


def shingles_py(s: str, k: int = 3) -> list[str]:
    t = tokens_py(s)
    if len(t) < k:
        return []
    return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]


def minhash8_py(s: str, k: int = 3) -> list[int] | None:
    sh = shingles_py(s, k)
    if not sh:
        return None
    h = np.array([poly_hash_py(x) for x in sh], dtype=np.int64)
    out = []
    for a, b in MINHASH_PERMS:
        out.append(int(((a * h + b) % MOD).min()))  # a*h < 2^62 → exact
    return out


def simhash32_py(s: str) -> int:
    th = np.array([poly_hash_py(t) for t in tokens_py(s)], dtype=np.int64)
    if len(th) == 0:
        return 0
    bits = (th[:, None] >> np.arange(32)[None, :]) & 1  # (n, 32)
    votes = np.where(bits == 1, 1, -1).sum(axis=0)
    return int(((votes > 0).astype(np.int64) << np.arange(32)).sum())


# --------------------------------------------------------------------------
# Whole-batch vectorization.
#
# The per-row helpers above are the readable spec mirror (and what the
# parity tests pin); the batch functions below compute the SAME values
# with numpy passes over the WHOLE Arrow batch — no per-shingle or
# per-token Python. The algebra relies on the concatenation rule
#   H(a || b) = (H(a) * B^len(b) + H(b)) mod M
# so a k=3 shingle hash assembles from the three token hashes and
# H(' ') = 32 without ever touching the shingle string:
#   H(t1+' '+t2+' '+t3) = h1*B^(l2+l3+2) + 32*B^(l2+l3+1)
#                       + h2*B^(l3+1)    + 32*B^l3 + h3   (mod M)
# Every product keeps one factor < M = 2^31-1, so int64 stays exact.
# --------------------------------------------------------------------------


def _segment_poly_hash(joined_codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Poly-hash each segment of ``joined_codes`` (concatenated
    codepoints, segment i spanning lens[i]) in one vectorized pass.
    Returns int64[n_segments]; empty segments hash to 0."""
    if len(lens) == 0:
        return np.zeros(0, dtype=np.int64)
    lens = lens.astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    total = int(ends[-1]) if len(ends) else 0
    if total == 0:
        return np.zeros(len(lens), dtype=np.int64)
    pw = _pows(int(lens.max()))
    # exponent of char at global position g in segment s: ends[s]-1-g
    exp = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
    terms = (joined_codes * pw[exp]) % MOD  # < 2^31 each
    nonempty = lens > 0
    sums = np.add.reduceat(terms, starts[nonempty])
    out = np.zeros(len(lens), dtype=np.int64)
    out[nonempty] = sums % MOD
    return out


def _batch_tokenize(texts: "pd.Series"):
    """tokens per doc → (flat token list, tok_counts int64[n_docs]);
    None docs get 0 tokens (callers mask them)."""
    flat: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, x in enumerate(texts):
        if x is None:
            continue
        toks = _TOKEN_RE.findall(x.lower())
        counts[i] = len(toks)
        flat.extend(toks)
    return flat, counts


def _batch_token_hashes(flat_tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(hash, len) per token, vectorized: tokens are [a-z0-9]+ so ascii
    bytes == codepoints == ascii() fold semantics."""
    lens = np.fromiter((len(t) for t in flat_tokens), dtype=np.int64,
                       count=len(flat_tokens))
    codes = np.frombuffer("".join(flat_tokens).encode("ascii"), dtype=np.uint8
                          ).astype(np.int64)
    return _segment_poly_hash(codes, lens), lens


def _batch_shingle_hashes(tok_h: np.ndarray, tok_len: np.ndarray,
                          tok_counts: np.ndarray, k: int = 3
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Hash of every k=3 shingle across the batch from token hashes.
    Returns (flat shingle hashes, shingle_counts per doc)."""
    assert k == 3, "vectorized path is specialized to k=3 (the spec's k)"
    sh_counts = np.maximum(tok_counts - (k - 1), 0)
    total_sh = int(sh_counts.sum())
    if total_sh == 0:
        return np.zeros(0, dtype=np.int64), sh_counts
    doc_tok_start = np.cumsum(tok_counts) - tok_counts
    sh_start = np.cumsum(sh_counts) - sh_counts
    # global token index of each shingle's first token
    j = (np.arange(total_sh, dtype=np.int64)
         - np.repeat(sh_start[sh_counts > 0], sh_counts[sh_counts > 0])
         + np.repeat(doc_tok_start[sh_counts > 0], sh_counts[sh_counts > 0]))
    h1, h2, h3 = tok_h[j], tok_h[j + 1], tok_h[j + 2]
    l2, l3 = tok_len[j + 1], tok_len[j + 2]
    pw = _pows(int((l2 + l3).max()) + 3)
    sp = np.int64(32)  # H(' ')
    H = (h1 * pw[l2 + l3 + 2]) % MOD
    H = (H + (sp * pw[l2 + l3 + 1]) % MOD) % MOD
    H = (H + (h2 * pw[l3 + 1]) % MOD) % MOD
    H = (H + (sp * pw[l3]) % MOD) % MOD
    H = (H + h3) % MOD
    return H, sh_counts


def _batch_minhash8(texts: pd.Series) -> pd.Series:
    flat, tok_counts = _batch_tokenize(texts)
    tok_h, tok_len = _batch_token_hashes(flat)
    sh_h, sh_counts = _batch_shingle_hashes(tok_h, tok_len, tok_counts)
    out = [None] * len(texts)
    has = sh_counts > 0
    if has.any():
        A = np.array([p[0] for p in MINHASH_PERMS], dtype=np.int64)[:, None]
        B_ = np.array([p[1] for p in MINHASH_PERMS], dtype=np.int64)[:, None]
        perms = (A * sh_h[None, :] + B_) % MOD  # (8, total_sh); a*h < 2^62
        sh_start = (np.cumsum(sh_counts) - sh_counts)[has]
        mins = np.minimum.reduceat(perms, sh_start, axis=1)  # (8, n_live)
        for col, i in enumerate(np.flatnonzero(has)):
            out[i] = mins[:, col].tolist()
    return pd.Series(out, index=texts.index, dtype=object)


def _batch_simhash32(texts: pd.Series) -> pd.Series:
    flat, tok_counts = _batch_tokenize(texts)
    tok_h, _ = _batch_token_hashes(flat)
    out = np.zeros(len(texts), dtype=np.int64)
    has = tok_counts > 0
    if has.any():
        bits = (tok_h[:, None] >> np.arange(32)[None, :]) & 1  # (n_tok, 32)
        starts = (np.cumsum(tok_counts) - tok_counts)[has]
        ones = np.add.reduceat(bits, starts, axis=0)           # (n_live, 32)
        votes = 2 * ones - tok_counts[has][:, None]            # +1/-1 sum
        sig = ((votes > 0).astype(np.int64) << np.arange(32)[None, :]).sum(axis=1)
        out[has] = sig
    res = pd.Series(out, index=texts.index, dtype=object)
    res[texts.isna()] = None
    return res


def _batch_poly_hash(texts: pd.Series) -> pd.Series:
    live = [x for x in texts if x is not None]
    lens = np.fromiter((len(x) for x in live), dtype=np.int64, count=len(live))
    codes = np.frombuffer("".join(live).encode("utf-32-le"), dtype=np.uint32
                          ).astype(np.int64)
    h = _segment_poly_hash(codes, lens)
    out = [None] * len(texts)
    it = iter(h.tolist())
    for i, x in enumerate(texts):
        if x is not None:
            out[i] = next(it)
    return pd.Series(out, index=texts.index, dtype=object)


@F.pandas_udf(T.LongType())
def poly_hash_fast(s: pd.Series) -> pd.Series:
    return _batch_poly_hash(s)


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash8_fast(s: pd.Series) -> pd.Series:
    return _batch_minhash8(s)


@F.pandas_udf(T.LongType())
def simhash32_fast(s: pd.Series) -> pd.Series:
    return _batch_simhash32(s)


@F.pandas_udf(T.ArrayType(T.StringType()))
def shingles_fast(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else shingles_py(x))


def _batch_shingle_hash_sets(texts: pd.Series) -> pd.Series:
    """DISTINCT shingle poly-hashes per doc (sorted ascending), the set
    payload of the LSH exact-verify stage; None text -> None, <k tokens
    -> []. Same hash spec as the minhash path (graded bit-exact)."""
    flat, tok_counts = _batch_tokenize(texts)
    tok_h, tok_len = _batch_token_hashes(flat)
    sh_h, sh_counts = _batch_shingle_hashes(tok_h, tok_len, tok_counts)
    starts = np.cumsum(sh_counts) - sh_counts
    out = [None] * len(texts)
    for i, x in enumerate(texts):
        if x is None:
            continue
        s, c = int(starts[i]), int(sh_counts[i])
        out[i] = np.unique(sh_h[s:s + c]).tolist() if c else []
    return pd.Series(out, index=texts.index, dtype=object)


@F.pandas_udf(T.ArrayType(T.LongType()))
def shingle_hash_sets_fast(s: pd.Series) -> pd.Series:
    return _batch_shingle_hash_sets(s)
