"""Driver-facing query registry.

Each entry pairs a PySpark implementation with an equivalent ANSI-SQL
oracle (run by DuckDB on the same parquet tables) — the correctness
gate described in ``__spark_entry__.py``. Keys map to SURVEY.md §2
operator ids.

Cross-engine determinism rules used throughout (see ``_det`` helpers):

- Money/measure sums go through exact ``DECIMAL`` arithmetic and are
  cast to DOUBLE only at the end — double summation order differs
  between engines, exact decimal sums do not.
- Derived floating-point expressions are written with the *same*
  operation order on both sides so IEEE results match bit-for-bit.
- Every ranking has a unique tiebreak column.
- Cross-engine hashing uses md5 (both engines agree on it), never
  engine-native hash functions.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, query  # noqa: F401
from . import core  # noqa: F401,E402  (registers core operator queries)
from . import cdc  # noqa: F401,E402  (SCD2 / incremental / sessionization)
from . import extra  # noqa: F401,E402  (set ops, pivot, JSON, as-of join)
from . import llmdata  # noqa: F401,E402  (dedup/similarity/text extensions)

__all__ = ["QUERIES", "QuerySpec", "query"]
