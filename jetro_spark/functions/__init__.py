"""Jetro builtin functions as PySpark Column builders.

Single source of truth for the reference's builtin catalog is the
``for_each_builtin!`` macro (reference: jetro-core/src/builtins/mod.rs:406-434).
Every function here is a *Column expression builder* — it composes
``pyspark.sql.functions`` so the result stays JVM-side inside whole-stage
codegen. No row-at-a-time Python UDFs.
"""

from jetro_spark.functions.core import (
    jt_add,
    jt_div,
    jt_element_at,
    jt_fuzzy_match,
    jt_slice,
    jt_truthy,
)
from jetro_spark.functions import strings, arrays

__all__ = [
    "jt_truthy",
    "jt_add",
    "jt_div",
    "jt_element_at",
    "jt_slice",
    "jt_fuzzy_match",
    "strings",
    "arrays",
]
