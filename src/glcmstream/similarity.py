"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; an LSH-bucketed
(random-hyperplane signature) variant as the 100TB scale path — candidate
generation becomes an equi-join on (plane-bucket) instead of a cross join,
then exact re-rank only inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

EMB_DIM = 64
LSH_PLANES = 12


def cosine_col(a, b):
    """cos(a, b) for two array<double> columns — pure built-ins
    (zip_with + aggregate), JVM-side, no Python."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(emb: DataFrame, target_id: int = 0, k: int = 10
                     ) -> DataFrame:
    """Exact cosine top-k neighbors of one vector (broadcast the probe)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"))
    probe = F.broadcast(e.filter(F.col("vec_id") == target_id)
                        .select(F.col("v").alias("pv")))
    out = (e.filter(F.col("vec_id") != target_id).crossJoin(probe)
           .select("vec_id",
                   F.round(cosine_col(F.col("v"), F.col("pv")), 4)
                   .alias("cosine")))
    return out.orderBy(F.desc("cosine"), "vec_id").limit(k)


@pandas_udf(LongType())
def hyperplane_sig_udf(emb: pd.Series) -> pd.Series:
    """Random-hyperplane LSH signature (LSH_PLANES sign bits, seeded)."""
    rng = np.random.default_rng(777)
    planes = rng.standard_normal((LSH_PLANES, EMB_DIM))
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    bits = (m @ planes.T) > 0
    sig = np.zeros(len(emb), dtype=np.int64)
    for b in range(LSH_PLANES):
        sig |= bits[:, b].astype(np.int64) << b
    return pd.Series(sig)


def lsh_near_neighbors(emb: DataFrame, min_cosine: float = 0.9) -> DataFrame:
    """All near-duplicate embedding pairs found via hyperplane-bucket
    equi-join + exact cosine re-rank inside buckets."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"), hyperplane_sig_udf("embedding").alias("sig"))
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(b, [F.col("a.sig") == F.col("b.sig"),
                      F.col("a.vec_id") < F.col("b.vec_id")])
    return (cand.select(F.col("a.vec_id").alias("id_a"),
                        F.col("b.vec_id").alias("id_b"),
                        F.round(cosine_col(F.col("a.v"), F.col("b.v")), 4)
                        .alias("cosine"))
            .filter(F.col("cosine") >= min_cosine))
