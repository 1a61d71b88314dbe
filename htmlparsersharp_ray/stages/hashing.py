"""Vectorized deterministic 64-bit hashing primitives.

Shared by the dedup family and the flagship bucket assignment. All
functions are process-stable (pandas SipHash with the library-default
fixed key; splitmix64 finalizer constants from the public reference
implementation) — never Python ``hash()`` (process-salted) and never a
Python-level per-element loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_WMUL = np.uint64(0x9E3779B97F4A7C15)


def hash_strings64(vals: np.ndarray, categorize: bool = True) -> np.ndarray:
    """uint64 hash per string — a single C loop (pandas SipHash-1-3 with
    the library-default fixed key), no Python-level per-element work.
    ``categorize=True`` factorizes first so repeated values hash once;
    pass ``False`` for mostly-unique arrays. Hash VALUES are identical
    either way. Call once per batch: the function has ~100 µs fixed
    overhead, so per-row calls dominate on short inputs."""
    if len(vals) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(vals, categorize=categorize)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — bijective avalanche over uint64."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def window_hashes(th: np.ndarray, n: int) -> np.ndarray:
    """Order-sensitive uint64 hash of every length-``n`` window of a
    token-hash array: vectorized polynomial (wrapping mod 2^64) plus the
    splitmix finalizer. ``len(th) >= n`` required."""
    m = len(th) - n + 1
    acc = th[:m].astype(np.uint64, copy=True)
    for j in range(1, n):
        acc = acc * _WMUL + th[j:j + m]
    return mix64(acc)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (numpy<2 has no
    bitwise_count)."""
    x = x.copy()
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
