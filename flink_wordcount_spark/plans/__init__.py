"""Declared query surface: every operator from SURVEY.md §2 as a named query.

Importing this package registers all queries into ``catalog.QUERIES`` /
``catalog.ORACLES`` (the driver contract in ``__spark_entry__.py`` re-exports
them).
"""

from . import (  # noqa: F401  (import for registration side effects)
    wordcount_q,
    relational_q,
    aggregates_q,
    windows_q,
    setops_q,
    scalar_q,
    events_q,
    dedup_q,
    similarity_q,
    textstats_q,
    multimodal_q,
    streaming_q,
    sql_q,
    udf_q,
)
from .catalog import ORACLES, QUERIES  # noqa: F401
