"""Property tests for the numeric mirror rules the late-round-3
operators rely on: the floored fixed-point F statistic vs exact
Fractions, DuckDB truncating division vs sign-magnitude halving,
LENGTH(bin(m)) vs int.bit_length, and the floor-then-sum ln terms.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from htmlparsersharp_ray.pipelines.relational import _floored_f_stat

K = 1 << 20


@st.composite
def moment_groups(draw):
    k = draw(st.integers(2, 6))
    groups = []
    for _ in range(k):
        vals = draw(st.lists(st.integers(0, 10_000), min_size=2,
                             max_size=30))
        n = len(vals)
        s = sum(vals)
        q = sum(v * v for v in vals)
        groups.append((n, s, q))
    return groups


class TestFlooredF:
    @settings(max_examples=200, deadline=None)
    @given(moment_groups())
    def test_tracks_exact_fraction_f(self, groups):
        df1, df2, f_sc = _floored_f_stat(groups)
        kk = len(groups)
        n = sum(g[0] for g in groups)
        S = sum(g[1] for g in groups)
        Q = sum(g[2] for g in groups)
        ssb = sum(Fraction(s * s, nt) for nt, s, _ in groups) \
            - Fraction(S * S, n)
        ssw = Q - sum(Fraction(s * s, nt) for nt, s, _ in groups)
        if ssw == 0:
            assert f_sc == -1
            return
        f_true = Fraction(ssb * (n - kk), ssw * (kk - 1))
        # flooring error: A loses < k units (of 1/K), B < 1, the
        # final division < 1/K, amplified by df2/ssw_k
        bound = (kk + 2) * (1 + float(f_true)) / K \
            * (1 + (n - kk) / max(1, float(ssw))) + 2 / K
        assert f_sc >= -1
        if f_sc >= 0:
            assert abs(f_sc / K - float(f_true)) <= bound + 1e-6

    def test_degenerate_contracts(self):
        assert _floored_f_stat([(3, 5, 25)])[2] == -1       # k < 2
        assert _floored_f_stat([(1, 2, 4), (1, 3, 9)])[2] == -1  # n<=k
        # zero within-group variance
        assert _floored_f_stat([(2, 4, 8), (2, 6, 18)])[2] == -1


class TestDuckdbDivisionMirror:
    @settings(max_examples=50, deadline=None)
    @given(st.integers(-10**17, 10**17))
    def test_truncating_halving_mirrors_duckdb(self, v):
        def tdiv2(x):
            return x // 2 if x >= 0 else -((-x) // 2)

        got = duckdb.connect().execute(
            "SELECT CAST(? AS BIGINT) // 2", [v]).fetchone()[0]
        assert int(got) == tdiv2(v)

    @settings(max_examples=50, deadline=None)
    @given(st.integers(1, 10**17))
    def test_bin_length_mirrors_bit_length(self, m):
        got = duckdb.connect().execute(
            "SELECT LENGTH(bin(CAST(? AS BIGINT)))", [m]).fetchone()[0]
        assert int(got) == m.bit_length()

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 10**15), st.integers(1, 10**15))
    def test_ln_ratio_term_mirrors_duckdb(self, a, b):
        # the floor(ln(x/y)*2^30) cell term used by the entropy /
        # survival / twonn family must match DuckDB bitwise
        import math

        got = duckdb.connect().execute(
            "SELECT CAST(FLOOR(ln(CAST(? AS BIGINT)"
            " / CAST(? AS BIGINT) * 1.0) * 1073741824.0) AS BIGINT)",
            [a, b]).fetchone()[0]
        want = math.floor(math.log(a / b) * 1073741824.0)
        assert int(got) == want

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 10**16), st.integers(1, 10**16))
    def test_sign_magnitude_divmod_identity(self, x, y):
        # trunc(x*K/y) = (x//y)*K + ((x%y)*K)//y for nonneg operands
        # (the silhouette s_scaled identity)
        kk = 1 << 10
        assert (x * kk) // y == (x // y) * kk + ((x % y) * kk) // y
