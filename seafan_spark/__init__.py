"""seafan_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference library invertedv/seafan.

This is NOT a port: the reference is a single-node, in-memory, row-at-a-time
Go engine; here every operator compiles to the PySpark DataFrame/Column API
so Catalyst + Tungsten handle optimization, shuffle and codegen, and the
design scales from local[32] tests to a multi-thousand-executor cluster.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow on).
- ``ftypes``     Feature-type metadata (continuous/categorical/one-hot/embed)
                 with a JSON round-trip — mirrors the semantics of the
                 reference's fields.go.
- ``sources``    parquet/csv/sql readers + writers; row-order contract.
- ``pipeline``   The Pipeline wrapper: DataFrame + FTypes + relational ops
                 (keep/drop/where/subset/sort/shuffle/join/append/describe).
- ``encode``     Encoding stage: z-score normalize, dictionary categorical
                 codes (sorted-unique order), one-hot.
- ``exprlang``   The expression language: seafan-grammar parser compiled to
                 unevaluated pyspark Column trees.
- ``agg``        Summary functions + grouped aggregation.
- ``slicer``     Group-iterator (the reference's group-by surface).
- ``diags``      Model diagnostics (KS, decile, segment, assess, R2).
- ``model``      ModSpec DSL -> MLlib estimators; fit/predict/save/load.
- ``llmops``     Scale extensions: dedup, similarity search, text analysis,
                 multimodal column plumbing.
- ``streaming``  Structured Streaming operators over event streams.
- ``cdc``        Changelog maintenance: MERGE-INTO apply, SCD2 history.
"""

from seafan_spark.ftypes import FParam, FRole, FType, FTypes
from seafan_spark.pipeline import Pipeline
from seafan_spark.session import get_session

__version__ = "0.1.0"

__all__ = [
    "FParam",
    "FRole",
    "FType",
    "FTypes",
    "Pipeline",
    "get_session",
    "__version__",
]
