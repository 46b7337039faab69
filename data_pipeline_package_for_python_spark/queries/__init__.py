"""The SURVEY §2.2 correctness catalog.

Importing this package populates ``QUERIES``: every module below registers
its (spark implementation, DuckDB oracle SQL) pairs via the ``@query``
decorator.  ``__spark_entry__.py`` re-exports this registry as the driver
contract.
"""

from ._registry import QUERIES, Query, query  # noqa: F401

from . import functionslib, llm, relational, streaming, udfs  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "query"]
