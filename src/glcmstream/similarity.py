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
from pyspark.sql.types import ArrayType, LongType

EMB_DIM = 64
ANN_BANDS = 4          # 4 bands x 4 sign bits each
ANN_BAND_BITS = 4
LSH_PLANES = ANN_BANDS * ANN_BAND_BITS


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


IVF_CELLS = 16
IVF_PROBES = 4


def ivf_assign(emb: DataFrame, n_cells: int = IVF_CELLS) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroid bootstrap is deterministic — the first `n_cells` vectors by
    vec_id (an IVF-lite stand-in for a k-means codebook; the partitioning
    and probe mechanics are identical, and determinism lets DuckDB verify
    the assignment). The broadcast of the tiny codebook + argmax keeps
    this one shuffle-free map stage at any corpus size.

    Returns (vec_id, v: array<double>, cell: bigint).
    """
    e = emb.select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"))
    cents = F.broadcast(e.filter(F.col("vec_id") < n_cells)
                        .select(F.col("vec_id").alias("cid"),
                                F.col("v").alias("cv")))
    scored = (e.crossJoin(cents)
              .withColumn("cos", cosine_col(F.col("v"), F.col("cv"))))
    from pyspark.sql import Window
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", F.col("cid").alias("cell")))


def ivf_topk(emb: DataFrame, target_id: int = 0, k: int = 10,
             probes: int = IVF_PROBES, n_cells: int = IVF_CELLS
             ) -> DataFrame:
    """IVF probed top-k: rank the probe vector against the codebook,
    scan only the `probes` nearest cells, exact cosine re-rank inside.
    The scale path next to brute_force_topk: at 10^9+ vectors the scan
    touches probes/n_cells of the corpus, partition-pruned by `cell`
    when the assignment is materialized as a cell-partitioned table.
    Recall vs brute force is pinned by tests/test_dedup_recall.py."""
    assigned = ivf_assign(emb, n_cells)
    probe = assigned.filter(F.col("vec_id") == target_id) \
        .select(F.col("v").alias("pv"))
    cents = (assigned.filter(F.col("vec_id") < n_cells)
             .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")))
    top_cells = (cents.crossJoin(F.broadcast(probe))
                 .withColumn("cos", cosine_col(F.col("cv"), F.col("pv")))
                 .orderBy(F.desc("cos"), F.asc("cid")).limit(probes)
                 .select("cid"))
    cand = assigned.join(F.broadcast(top_cells),
                         assigned.cell == F.col("cid"))
    out = (cand.filter(F.col("vec_id") != target_id)
           .crossJoin(F.broadcast(probe))
           .select("vec_id",
                   F.round(cosine_col(F.col("v"), F.col("pv")), 4)
                   .alias("cosine")))
    return out.orderBy(F.desc("cosine"), "vec_id").limit(k)


@pandas_udf(ArrayType(LongType()))
def hyperplane_bands_udf(emb: pd.Series) -> pd.Series:
    """Banded random-hyperplane LSH: ANN_BANDS signatures of
    ANN_BAND_BITS sign bits each (seeded). Round-1 used one 12-bit
    signature in a single band — P(collide | cos 0.5) ~ 0.3%, so the
    operator never retrieved a neighbor; banding gives the OR-of-ANDs
    S-curve: P = 1-(1-p^4)^4 with p = 1-theta/pi (~59% at cos 0.5,
    ~99.8% at cos 0.9)."""
    rng = np.random.default_rng(777)
    planes = rng.standard_normal((LSH_PLANES, EMB_DIM))
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    bits = ((m @ planes.T) > 0).astype(np.int64)
    weights = 1 << np.arange(ANN_BAND_BITS, dtype=np.int64)
    out = []
    for r in bits:
        out.append([int(r[b * ANN_BAND_BITS:(b + 1) * ANN_BAND_BITS]
                        @ weights) for b in range(ANN_BANDS)])
    return pd.Series(out)


def lsh_near_neighbors(emb: DataFrame, min_cosine: float = 0.9) -> DataFrame:
    """Near-neighbor embedding pairs via banded hyperplane LSH: explode
    to (band, bucket) metadata rows (ids only — vectors join back for
    the small candidate set), equi-join per band, exact cosine re-rank.

    Scale note: ANN_BAND_BITS must grow with log2(corpus) to keep bucket
    occupancy (and the per-band candidate join) bounded — with b bits a
    band has 2^b buckets and candidates ~ bands * n^2 / 2^b. The 4-bit
    default suits the <=5k-vector driver fixtures; at 10^9 vectors use
    ~24-28 bits per band (buckets stay ~thousands of vectors) plus more
    bands to hold recall, which keeps the join linear in n."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"),
                   hyperplane_bands_udf("embedding").alias("sigs"))
    bands = e.select("vec_id",
                     F.posexplode("sigs").alias("band", "bucket"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.bucket") == F.col("b.bucket"),
                       F.col("a.vec_id") < F.col("b.vec_id")])
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    vecs = e.select("vec_id", "v")
    return (cand
            .join(vecs.select(F.col("vec_id").alias("id_a"),
                              F.col("v").alias("va")), "id_a")
            .join(vecs.select(F.col("vec_id").alias("id_b"),
                              F.col("v").alias("vb")), "id_b")
            .select("id_a", "id_b",
                    F.round(cosine_col(F.col("va"), F.col("vb")), 4)
                    .alias("cosine"))
            .filter(F.col("cosine") >= min_cosine))
