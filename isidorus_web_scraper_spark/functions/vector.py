"""Shared vector expressions.

``cosine`` is THE cosine-similarity expression — every consumer
(dataset_queries' ANN/dedup family, the persisted IVF index's cell
assignment) must import THIS one: the IVF probe's correctness contract
is that it reproduces ann_ivf_topk's scores bit-for-bit, which only
holds while both sides evaluate the identical expression tree (a
duplicate that drifted by one cast would break byte-exact oracle
parity silently — review finding, round 5)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )
    return dot / (na * nb)
