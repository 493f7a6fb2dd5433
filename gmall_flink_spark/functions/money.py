"""Exact money arithmetic.

The reference computes all money on java BigDecimal
(bean/TradeSkuOrderBean.java:50-59, app/dws/DwsTradeSkuOrderWindow.java:127-135).
We mirror that with DecimalType: cast the (exactly 2-decimal) double inputs
to DECIMAL(18,2) *before* aggregating so sums are exact and independent of
partition/accumulation order — this is what makes Spark results hash-identical
to the DuckDB oracle, and at 100 TB it removes FP-nondeterminism across
shuffles. Final results are cast back to double (exact conversion) for a
stable cross-engine schema.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(c: Column | str) -> Column:
    """Cast a money/measure column to exact decimal before arithmetic."""
    return (F.col(c) if isinstance(c, str) else c).cast(MONEY)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact decimal sum, surfaced as double (exact conversion)."""
    return F.sum(dec(c)).cast("double").alias(alias)
