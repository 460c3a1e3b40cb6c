"""Vector math over array<float|double> embedding columns — native exprs.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side; the fold is
sequential over the array (deterministic), and we cast to double *before*
multiplying so results are reproducible bit-for-bit across runs and match
a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
