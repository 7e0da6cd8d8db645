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
        for i in range(1, size):  # one-time per worker; cached after
            p[i] = (p[i - 1] * BASE) % MOD
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


@F.pandas_udf(T.LongType())
def poly_hash_fast(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else poly_hash_py(x))


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash8_fast(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else minhash8_py(x))


@F.pandas_udf(T.LongType())
def simhash32_fast(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else simhash32_py(x))


@F.pandas_udf(T.ArrayType(T.StringType()))
def shingles_fast(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else shingles_py(x))
