"""Query registry — the single source of truth behind the driver
contract (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 registers here as a
callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible,
an equivalent ANSI-SQL string the DuckDB oracle runs on the same
parquet tables.

Oracle-parity rules (learned the hard way, encoded once):

* Alias every computed column identically on both sides — the driver
  sorts columns by name before hashing.
* Sums of doubles are order-dependent; both engines must sum EXACTLY.
  We cast to DECIMAL before SUM (the data carries <=2 decimals, derived
  products <=6, so DECIMAL(*,8) never hits a rounding tie), then cast
  the total back to DOUBLE — bit-identical in both engines.
* Prefer BIGINT epoch-millis (`unix_millis` / `epoch_ms`) or formatted
  strings over raw timestamps in outputs.
* Every ORDER BY ... LIMIT carries a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # Scale-aware oracle twin (round-12, verdict item #3): a callable
    # (sf_dir) -> SQL that regenerates the oracle for the CORPUS SIZE
    # at that path — used by the builder's own sweeps (tools/
    # oracle_check.py) so adaptive-grid queries hash-match at ANY
    # sweep scale, not just the fixture the static string pins. The
    # static ``oracle`` stays the driver-contract surface
    # (__spark_entry__.oracle_sql()); at the sf0.01 fixture both must
    # produce identical results (the adaptive rule reproduces the
    # pinned grid there — the q163/q149 equality pattern).
    oracle_fn: Callable[[str], str] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    oracle_fn: Callable[[str], str] | None = None,
):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, tags, (fn.__doc__ or "").strip(), oracle_fn
        )
        return fn

    return deco


# Decimal-exact sum helpers (see module docstring).
DEC = "decimal(24,8)"


def dsum(col):
    """Order-independent exact SUM of a double column: decimal-sum,
    then decimal -> STRING -> double. The string hop matters: casting
    the exact decimal straight to double rounds differently in Spark
    vs DuckDB by 1 ulp once totals reach ~1e10 (observed at sf0.1 on
    q01/q27/q75), while string->double parsing is correctly-rounded
    IEEE in both engines, so the doubles match bit for bit at any
    magnitude. DuckDB twin: O_DSUM.
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("string").cast("double")


def O_DSUM(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE)"
