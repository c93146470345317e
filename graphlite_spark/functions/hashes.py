"""Hash primitives computable identically in Spark SQL and DuckDB.

The correctness oracle re-evaluates every hash-derived column in DuckDB, so
the only usable digest is md5 (xxhash64/sha1 exist in one engine but not
the other).  48-bit integers are carved out of the hex digest:

* Spark : ``conv(substring(md5(x), 1, 12), 16, 10)`` cast to long
* DuckDB: ``CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)``

48 bits keeps every value exactly representable and leaves headroom for
bit arithmetic (simhash) within a signed 64-bit long.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"


def md5_concat(*cols: Column | str) -> Column:
    """md5 over SEP-joined pieces (mirror: ``md5(concat_ws(chr(31), ...))``)."""
    return F.md5(F.concat_ws(SEP, *[F.col(c) if isinstance(c, str) else c for c in cols]))


def hash48(col: Column) -> Column:
    """First 48 bits of md5(col) as a non-negative long."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def hash48_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash48` over a SQL expression string."""
    return f"CAST('0x' || substr(md5({expr}), 1, 12) AS BIGINT)"
