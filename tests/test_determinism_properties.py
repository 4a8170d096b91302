"""Property tests for the cross-engine determinism kernels: the DuckDB
oracle forms (`_OQ6`, `_OD2`, `_OQ6INT`) must agree BYTE-for-byte with
the Spark-side semantics over adversarial inputs — tiny negatives
(the -0.0 class), true decimal midpoints, and integers past 2**53 —
without spinning up Spark (the Spark kernels' integer semantics are
mirrored exactly in plain Python, which unit tests pin elsewhere)."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

CON = duckdb.connect()


def _py_q6(x: float) -> float:
    """Python mirror of Spark q6_col: BIGINT floor (no signed zero on the
    integer), cast double, /1e6 — always emits +0.0 for the zero class."""
    if x < 0:
        q = -math.floor(-x * 1e6 + 0.5)
    else:
        q = math.floor(x * 1e6 + 0.5)
    return float(q) / 1e6


def _duck_oq6(x: float) -> float:
    from __spark_entry__ import _OQ6

    return CON.execute(f"SELECT {_OQ6('?::DOUBLE')}", [x, x, x]).fetchone()[0]


def _py_big_to_double(s: int) -> float:
    p50 = 1 << 50
    m = abs(s)
    d = float(m // p50) * float(p50) + float(m % p50)
    return -d if s < 0 else d


def _duck_od2(s: int) -> float:
    from __spark_entry__ import _OD2

    # SQL literal, NOT a bound parameter: duckdb's Python binding
    # degrades ints beyond int64 to DOUBLE before any ::HUGEINT cast
    # (value silently corrupted) — a harness artifact no real oracle
    # hits, since oracle HUGEINTs arise from SQL-side exact arithmetic
    return CON.execute(f"SELECT {_OD2(f'({s})::HUGEINT')}").fetchone()[0]


_finite = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)
_tiny = st.floats(min_value=-1e-6, max_value=1e-6, allow_nan=False)
_micro_midpoints = st.integers(min_value=-10**15, max_value=10**15).map(
    lambda k: (k * 10 + 5) / 1e7  # true ...5 midpoints at the 7th place
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_finite, _tiny, _micro_midpoints))
def test_oq6_matches_spark_semantics_bytewise(x):
    a = _py_q6(x)
    b = _duck_oq6(x)
    assert struct.pack("<d", a) == struct.pack("<d", b), (x, a, b)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-4.99e-7, max_value=-1e-300, allow_nan=False))
def test_oq6_zero_class_is_positive_zero(x):
    """The entire (-5e-7, 0) class must emit +0.0 bytes on BOTH sides —
    the r06 driver-red mechanism."""
    plus = struct.pack("<d", 0.0)
    assert struct.pack("<d", _py_q6(x)) == plus
    assert struct.pack("<d", _duck_oq6(x)) == plus


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.integers(min_value=-(2**120), max_value=2**120),
        # the hazard band: 54-90 bit magnitudes near halfway points
        st.integers(min_value=2**53, max_value=2**90),
        st.integers(min_value=-(2**90), max_value=-(2**53)),
    )
)
def test_od2_matches_hi_lo_split_bytewise(s):
    a = _py_big_to_double(s)
    b = _duck_od2(s)
    assert struct.pack("<d", a) == struct.pack("<d", b), (s, a, b)


@pytest.mark.parametrize(
    "x,expected_micro",
    [(0.000001, 1), (-0.000001, -1), (0.0000005, 1), (-0.0000004, 0),
     (1.5e-7, 0), (123.4567891, 123456789)],
)
def test_oq6int_half_up_exact_cases(x, expected_micro):
    from __spark_entry__ import _OQ6INT

    got = CON.execute(f"SELECT {_OQ6INT('?::DOUBLE')}", [x, x, x]).fetchone()[0]
    assert int(got) == expected_micro
