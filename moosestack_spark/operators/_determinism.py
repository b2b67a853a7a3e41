"""Cross-engine float determinism helpers.

The correctness gate hash-compares our Spark results against a DuckDB oracle.
Double sums are accumulation-order-dependent, so any aggregate over a double
column must be made exact:

- source columns holding fixed-point values (prices with 2 decimals, discounts
  with 2, quantities integral) are cast to DECIMAL *before* arithmetic; the
  double is within ~1e-10 of the true fixed-point value so the cast rounds
  identically in both engines (never near a half-way boundary);
- sums/products then happen in exact decimal arithmetic (order-independent);
- the final value is cast back to DOUBLE (both engines pick the same nearest
  double for the same decimal), so the surfaced schema stays double;
- averages are computed as CAST(sum_dec AS DOUBLE) / count — a single IEEE
  division of identical inputs, deterministic on both engines.

Never round a *computed* double (Spark's BigDecimal HALF_UP and DuckDB's
multiply-and-floor rounding can disagree at boundaries); only cast
fixed-point sources.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf-scaled sums: values < 1e6 with <=4 decimals, 1e10 rows.
DEC = "decimal(25,4)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str) -> Column:
    """Exact sum of a fixed-point-valued double column, surfaced as double."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent average: exact decimal sum / count, one IEEE divide."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(c)).cast("double") / F.count(c)


# The matching DuckDB SQL spellings (kept next to the Spark helpers so the
# two sides can't drift):
def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(25,4))"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT({expr})"
