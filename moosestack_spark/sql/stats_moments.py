"""Sample-moment SQL builders shared by the Spark template and the DuckDB
oracle (the geo.py discipline: ONE generator, so the two engines evaluate a
TEXTUALLY identical double chain and agree bit-for-bit).

Formulas (ClickHouse docs for skewSamp/kurtSamp — unbiased sample moments):

    mu   = s1 / n                       (s_k = exact integer power sums)
    c2   = s2 - n*mu^2                  (sum of squared deviations)
    c3   = s3 - 3*mu*s2 + 2*n*mu^3
    c4   = s4 - 4*mu*s3 + 6*mu^2*s2 - 3*n*mu^4
    var  = c2 / (n - 1)
    skewSamp = (c3 * n / ((n-1)(n-2))) / var^1.5
    kurtSamp = (c4 / (n - 1)) / var^2   (non-excess)

Determinism: power sums are exact BIGINT (inputs must be integers small
enough that s4 fits 2^53 when widened to DOUBLE — the gates keep |x| <= a
few hundred); the double chain after that is identical text in both
engines, and var^1.5 is spelled var*SQRT(var) because SQRT is correctly
rounded everywhere while pow() is implementation-defined.
"""

from __future__ import annotations


def _n(x: str) -> str:
    return f"CAST(COUNT({x}) AS DOUBLE)"


def _s(x: str, k: int) -> str:
    prod = " * ".join([f"CAST({x} AS BIGINT)"] * k)
    return f"CAST(SUM({prod}) AS DOUBLE)"


def _mu(x: str) -> str:
    return f"({_s(x, 1)} / {_n(x)})"


def _c2(x: str) -> str:
    n, mu = _n(x), _mu(x)
    return f"({_s(x, 2)} - {n} * {mu} * {mu})"


def _var_samp(x: str) -> str:
    return f"({_c2(x)} / ({_n(x)} - CAST(1 AS DOUBLE)))"


def skew_samp_sql(x: str) -> str:
    n, mu, var = _n(x), _mu(x), _var_samp(x)
    c3 = (
        f"({_s(x, 3)} - CAST(3 AS DOUBLE) * {mu} * {_s(x, 2)}"
        f" + CAST(2 AS DOUBLE) * {n} * {mu} * {mu} * {mu})"
    )
    return (
        f"(({c3} * {n} / (({n} - CAST(1 AS DOUBLE)) *"
        f" ({n} - CAST(2 AS DOUBLE)))) / ({var} * SQRT({var})))"
    )


def kurt_samp_sql(x: str) -> str:
    n, mu, var = _n(x), _mu(x), _var_samp(x)
    c4 = (
        f"({_s(x, 4)} - CAST(4 AS DOUBLE) * {mu} * {_s(x, 3)}"
        f" + CAST(6 AS DOUBLE) * {mu} * {mu} * {_s(x, 2)}"
        f" - CAST(3 AS DOUBLE) * {n} * {mu} * {mu} * {mu} * {mu})"
    )
    return f"(({c4} / ({n} - CAST(1 AS DOUBLE))) / ({var} * {var}))"
