"""pandas_tsdb_spark — a PySpark-native analytics engine with the
capabilities of ``dashesy/pandas-tsdb`` (pandas time-series extension),
re-expressed Spark-first for 100 TB scale.

Scope contract: SURVEY.md §2 (the reference checkout at /root/reference
is empty — see SURVEY.md §0 — so the operator inventory there is the
authoritative capability definition; no reference file:line citations
are possible).

Layout:
  session.py    — SparkSession factory tuned for the local[32] bench box
  catalog.py    — fixture table loaders + declared schemas
  registry.py   — query/oracle registry consumed by __spark_entry__.py
  api.py        — TsFrame: the pandas-tsdb fluent surface (rolling/
                  resample/merge_asof/ewm/...) over Spark DataFrames
  store.py      — TsStore: the named-series time-series store (append/
                  fetch with partition pruning / compact)
  operators/    — plan builders, one module per SURVEY §2 family
  streaming/    — Structured Streaming jobs over the events schema
"""

from pandas_tsdb_spark.api import TsFrame  # noqa: F401
from pandas_tsdb_spark.registry import (  # noqa: F401
    REGISTRY,
    _register_kernels_by_value,
    query,
)
from pandas_tsdb_spark.store import TsStore  # noqa: F401

# Kernels must survive executors that cannot import this package (driver
# cwd outside the repo) — see registry._register_kernels_by_value.
_register_kernels_by_value()

__version__ = "0.1.0"
