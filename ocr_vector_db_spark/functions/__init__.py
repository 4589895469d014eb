"""Column-level function library.

Each module pairs a pure-Python implementation (used inside pandas UDFs and
unit tests) with a Spark Column builder (built-in `pyspark.sql.functions`
expressions wherever possible so they stay JVM-side / whole-stage-codegen).
"""

from ocr_vector_db_spark.functions import (  # noqa: F401
    chunking,
    hashing,
    text,
    text_analysis,
    validators,
    vector,
)
