"""Operator plan builders — importing this package registers every query.

One module per SURVEY.md §2 family. Add new modules to _MODULES.
"""

from pandas_tsdb_spark.operators import (  # noqa: F401
    analytics,
    graph,
    joins,
    llm_text,
    llm_vectors,
    pipeline,
    relational,
    scalars,
    scans,
    sorts_sets,
    streaming,
    timeseries,
    tpch,
    udfs,
    windows,
)
