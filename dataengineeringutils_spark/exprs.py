"""Shared expression helpers for oracle-stable numerics.

Cross-engine hash-matching (Spark vs DuckDB) demands bit-identical values.
Rules used across every declared operator:

- Per-row arithmetic on doubles is bit-identical across engines (same IEEE
  ops in the same order) — leave it unrounded.
- SUM over doubles is order-dependent, and Spark's shuffle makes the order
  nondeterministic run-to-run. Fix: cast each value to an exact DECIMAL
  before summing (decimal addition is associative/exact), then cast the
  total back to DOUBLE. Both engines produce the same decimal, hence the
  same double. At 100 TB this also avoids float drift in partial/final
  aggregation merges.
- AVG: exact decimal SUM (as double) divided by COUNT — one deterministic
  double division.
- Sample stats (stddev/var/corr) have no exact form — round to 4 dp in
  both engines (SURVEY.md §2 conventions).

The matching DuckDB SQL fragments are in the ``o_*`` string helpers so the
Spark expression and its oracle are maintained side by side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
MONEY4 = "decimal(22,4)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money_sum(col: str | Column) -> Column:
    """Exact, order-independent SUM of a 2-dp money column -> double."""
    return F.sum(_c(col).cast(MONEY)).cast("double")


def money4_sum(col: str | Column) -> Column:
    """Exact SUM of a 4-dp product (2dp x 2dp money math) -> double."""
    return F.sum(_c(col).cast(MONEY4)).cast("double")


def money_avg(col: str | Column) -> Column:
    """Exact decimal sum / count -> double (deterministic division)."""
    return money_sum(col) / F.count(_c(col))


def revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """TPC-H style per-row revenue: price * (1 - discount), raw double."""
    return _c(price) * (F.lit(1.0) - _c(discount))


def o_money_sum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def o_money4_sum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(22,4))) AS DOUBLE)"


def o_money_avg(col: str) -> str:
    return f"{o_money_sum(col)} / COUNT({col})"
