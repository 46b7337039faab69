"""The SURVEY §2.2 correctness catalog.

Importing this package populates ``QUERIES``: every module below registers
its (spark implementation, DuckDB oracle SQL) pairs via the ``@query``
decorator.  ``__spark_entry__.py`` re-exports this registry as the driver
contract.
"""

from ._registry import QUERIES, Query, query  # noqa: F401

# Import order IS driver registration/check order.  The correctness driver
# sweeps queries first-to-last under a wall-clock budget (round 1 stopped
# after the first 50), so families go never-checked-first: relational
# (joins/aggs/windows/setops), then udfs and streaming (also unchecked in
# r1), then the function families and LLM ops that already earned green
# rows.
from . import (  # noqa: E402,F401
    relational,
    udfs,
    streaming,
    timeseries,
    analytics,
    functionslib,
    llm,
)

__all__ = ["QUERIES", "Query", "query"]
