"""Declared query surface: every operator from SURVEY.md §2 as a named query.

Importing this package registers all queries into ``catalog.QUERIES`` /
``catalog.ORACLES`` (the driver contract in ``__spark_entry__.py`` re-exports
them).
"""

# Registration order == the driver's verification order. Round 1's artifact
# truncated mid-run at ~query 50, leaving the back half unverified — so the
# families that have never had a driver-verified row (dedup, similarity,
# streaming, SQL, UDF, the untested scalar fns, events, textstats,
# multimodal) now register FIRST; the families fully green in
# CORRECTNESS_r01 come last.
from . import (  # noqa: F401  (import for registration side effects)
    dedup_q,
    similarity_q,
    streaming_q,
    sql_q,
    udf_q,
    scalar_q,
    events_q,
    textstats_q,
    multimodal_q,
    wordcount_q,
    relational_q,
    aggregates_q,
    windows_q,
    setops_q,
)
from .catalog import ORACLES, QUERIES  # noqa: F401
