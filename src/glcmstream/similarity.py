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
ANN_BANDS = 8          # default band count (see lsh_geometry)
ANN_BAND_BITS = 4      # fallback bits/band for tiny corpora


def lsh_geometry(n_vectors: int, bands: int = ANN_BANDS) -> tuple[int, int]:
    """Corpus-size-derived hyperplane-LSH geometry (round-2 verdict #4:
    the geometry was a compile-time constant the docstring said must
    scale with log2(corpus)).

    bits/band ~ log2(n) - 4 keeps expected bucket occupancy ~16 vectors,
    so the per-band self-join stays linear in n: candidates ~
    bands * n^2 / 2^bits = bands * 16 * n. At 10^9 vectors this yields
    ~26 bits/band (the docstring recipe); at driver-fixture sizes it
    floors at 4 bits so buckets stay populated enough to retrieve
    moderate-cosine neighbors. Recall follows the OR-of-ANDs S-curve
    P = 1-(1-p^bits)^bands with p = 1-theta/pi, so more bits (bigger
    corpora) need high-cosine targets or more bands — the standard LSH
    trade-off, now explicit per call."""
    bits = int(round(np.log2(max(n_vectors, 2)))) - 4
    return bands, min(28, max(4, bits))


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


def kmeans_codebook(emb: DataFrame, n_cells: int = IVF_CELLS,
                    iters: int = 8, sample_cap: int = 4096) -> DataFrame:
    """Learned IVF codebook: spherical k-means trained in ONE
    applyInPandas pass over a deterministic hash-sample (round-2 verdict
    #5 — the bootstrap codebook was 'first 16 vectors', not learned).

    The sample is the `sample_cap` vectors with smallest
    xxhash64(vec_id) — deterministic, corpus-size-independent, bounded
    memory for the single training group. Init = first n_cells sampled
    vectors in hash order; fixed iteration count; empty cells keep their
    previous centroid — fully deterministic, so the driver's repeated
    runs and the recall tests see one codebook. At 10^9+ vectors the
    sample stays 4096 rows: training cost is O(sample x cells x iters),
    independent of corpus size."""
    v = F.col("embedding").cast("array<double>")
    e = emb.select(F.xxhash64(F.col("vec_id").cast("string")).alias("h"),
                   v.alias("v"))
    sample = e.orderBy("h").limit(sample_cap)

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h").reset_index(drop=True)
        M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        C = M[:n_cells].copy()
        for _ in range(iters):
            asg = np.argmax(M @ C.T, axis=1)
            for c in range(n_cells):
                m = asg == c
                if m.any():
                    u = M[m].mean(axis=0)
                    n = np.linalg.norm(u)
                    if n > 0:
                        C[c] = u / n
        return pd.DataFrame({"cid": np.arange(n_cells, dtype=np.int64),
                             "cv": [c.tolist() for c in C]})

    return (sample.groupBy(F.lit(1).alias("_g"))
            .applyInPandas(lambda pdf: train(pdf),
                           "cid long, cv array<double>"))


def ivf_assign_to(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """Assign every vector to its nearest codebook centroid (broadcast
    codebook + argmax — one shuffle-free map stage at any corpus size).
    Returns (vec_id, v, cell)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"))
    cents = F.broadcast(codebook.select(F.col("cid"), F.col("cv")))
    scored = (e.crossJoin(cents)
              .withColumn("cos", cosine_col(F.col("v"), F.col("cv"))))
    from pyspark.sql import Window
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", F.col("cid").alias("cell")))


def ivf_build(emb: DataFrame, table_dir: str,
              n_cells: int = IVF_CELLS) -> str:
    """Materialize the IVF index ONCE (round-2 verdict: every query
    re-ran the full assignment): a learned codebook parquet plus the
    assignment written as a CELL-PARTITIONED table, so probed reads
    touch only probes/n_cells of the data via partition pruning. Safe
    for concurrent builders: written under a tmp dir, renamed into
    place."""
    import os
    import shutil
    import uuid as _uuid
    if os.path.exists(os.path.join(table_dir, "_BUILT")):
        return table_dir
    tmp = table_dir + f".tmp-{_uuid.uuid4().hex[:8]}"
    codebook = kmeans_codebook(emb, n_cells)
    codebook.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(tmp, "codebook"))
    spark = emb.sparkSession
    cb = spark.read.parquet(os.path.join(tmp, "codebook"))
    ivf_assign_to(emb, cb).write.mode("overwrite") \
        .partitionBy("cell").parquet(os.path.join(tmp, "assignment"))
    open(os.path.join(tmp, "_BUILT"), "w").close()
    try:
        os.rename(tmp, table_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent build won
    return table_dir


def ivf_topk_trained(spark, emb: DataFrame, table_dir: str,
                     target_id: int = 0, k: int = 10,
                     probes: int = IVF_PROBES,
                     n_cells: int = IVF_CELLS) -> DataFrame:
    """IVF probed top-k over the MATERIALIZED learned index: rank the
    probe against the (tiny) codebook, read only the `probes` nearest
    cell partitions of the assignment table (partition-pruned scan),
    exact cosine re-rank inside. The 10^9-vector query path: index built
    once, each query touches probes/n_cells of the corpus."""
    ivf_build(emb, table_dir, n_cells)
    import os
    cb = spark.read.parquet(os.path.join(table_dir, "codebook"))
    assigned = spark.read.parquet(os.path.join(table_dir, "assignment"))
    probe = F.broadcast(
        emb.filter(F.col("vec_id") == target_id)
        .select(F.col("embedding").cast("array<double>").alias("pv")))
    top_cells = [r["cid"] for r in
                 (cb.crossJoin(probe)
                  .withColumn("cos", cosine_col(F.col("cv"), F.col("pv")))
                  .orderBy(F.desc("cos"), F.asc("cid")).limit(probes)
                  .select("cid").collect())]
    cand = assigned.filter(F.col("cell").isin(top_cells))
    out = (cand.filter(F.col("vec_id") != target_id)
           .crossJoin(probe)
           .select("vec_id",
                   F.round(cosine_col(F.col("v"), F.col("pv")), 4)
                   .alias("cosine")))
    return out.orderBy(F.desc("cosine"), "vec_id").limit(k)


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


def hyperplane_bands_udf(bands: int, band_bits: int):
    """Banded random-hyperplane LSH signature UDF for a given geometry:
    `bands` signatures of `band_bits` sign bits each (seeded planes —
    identical across calls/workers). Round-1 used one 12-bit signature in
    a single band — P(collide | cos 0.5) ~ 0.3%, so the operator never
    retrieved a neighbor; banding gives the OR-of-ANDs S-curve
    P = 1-(1-p^bits)^bands with p = 1-theta/pi. Signature packing is a
    vectorized matmul over the whole Arrow batch."""
    n_planes = bands * band_bits

    @pandas_udf(ArrayType(LongType()))
    def _sig(emb: pd.Series) -> pd.Series:
        rng = np.random.default_rng(777)
        planes = rng.standard_normal((n_planes, EMB_DIM))
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        bits = ((m @ planes.T) > 0).astype(np.int64) \
            .reshape(len(emb), bands, band_bits)
        weights = 1 << np.arange(band_bits, dtype=np.int64)
        sigs = bits @ weights            # (n, bands)
        return pd.Series(sigs.tolist())
    return _sig


def lsh_near_neighbors(emb: DataFrame, min_cosine: float = 0.9,
                       bands: int | None = None,
                       band_bits: int | None = None,
                       n_vectors: int | None = None) -> DataFrame:
    """Near-neighbor embedding pairs via banded hyperplane LSH with a
    BUCKET-LOCAL exact re-rank.

    Round-5 shape (id-only candidate self-join, then two joins attaching
    the vectors back, then a Catalyst higher-order-function dot product
    per candidate) spent ~21 of its 24 s at the 50k bench fixture on the
    re-rank: 3.7M candidate pairs shuffled through TWO attach joins (the
    second carrying a 512 B array per row) and 3.7M interpreted
    `aggregate(zip_with(...))` folds. This path instead shuffles each
    normalized vector ONCE PER BAND keyed by (band, bucket) — `bands` x
    corpus rows, linear, ~0.2 GB at 50k vs ~1.3 GB — and computes every
    in-bucket pair's dot product vectorized in numpy inside one
    mapInPandas pass over the sorted partition. Only pairs that can pass
    the threshold (margin-loose pre-filter) leave Python; the EXACT
    predicate `round(dot, 4) >= min_cosine` stays in Spark, and the dot
    itself is `np.add.accumulate` — a strict sequential left fold, the
    same IEEE op sequence as the old JVM `aggregate` — so emitted values
    are bit-identical to the joined path (normalization stays JVM-side,
    unchanged). Hot buckets are processed in bounded pair chunks, so a
    skewed bucket costs time, not memory.

    Geometry defaults derive from the corpus size via lsh_geometry()
    (bits/band ~ log2(n) - 4 keeps expected bucket occupancy ~16, so
    in-bucket pair work is linear in n); pass bands/band_bits explicitly
    to override, or n_vectors to skip the sizing count()."""
    if bands is None or band_bits is None:
        n = n_vectors if n_vectors is not None else emb.count()
        d_bands, d_bits = lsh_geometry(n)
        bands = bands if bands is not None else d_bands
        band_bits = band_bits if band_bits is not None else d_bits
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                             F.lit(0.0), lambda acc, x: acc + x))
    # normalize ONCE per vector so the per-pair re-rank is a single dot
    # product; keep it JVM-side so vn bits match the round-5 output
    e = emb.select("vec_id",
                   F.transform(v, lambda x: x / nrm).alias("vn"),
                   hyperplane_bands_udf(bands, band_bits)("embedding")
                   .alias("sigs"))
    rows = e.select("vec_id", "vn",
                    F.posexplode("sigs").alias("band", "bucket"))
    # margin-loose raw threshold: round() moves a value by <= 5e-5, so
    # no pair with raw dot < min_cosine - 1e-4 can round past the exact
    # Spark-side predicate below
    raw_floor = min_cosine - 1e-4
    pair_chunk = 1 << 21  # pairs per numpy block in a hot bucket

    def bucket_dots(it):
        # a (band, bucket) group can span Arrow chunk boundaries —
        # concat the partition first (rows are key-cardinality x bands,
        # a few MB per partition; same pattern as the sliding finalizer)
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        M = np.stack(pdf["vn"].to_numpy())
        ids = pdf["vec_id"].to_numpy(np.int64)
        code = (pdf["band"].to_numpy(np.int64) * (1 << 32)
                + pdf["bucket"].to_numpy(np.int64))
        chg = np.flatnonzero(np.diff(code)) + 1
        starts = np.concatenate([[0], chg, [len(pdf)]])
        out_a, out_b, out_d = [], [], []
        for s, t in zip(starts[:-1], starts[1:]):
            k = t - s
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            for c0 in range(0, len(iu), pair_chunk):
                ic = iu[c0:c0 + pair_chunk]
                jc = ju[c0:c0 + pair_chunk]
                prod = M[s + ic] * M[s + jc]
                dots = np.add.accumulate(prod, axis=1)[:, -1]
                keep = dots >= raw_floor
                if keep.any():
                    out_a.append(ids[s + ic[keep]])
                    out_b.append(ids[s + jc[keep]])
                    out_d.append(dots[keep])
        if out_a:
            yield pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "dot": np.concatenate(out_d)})

    nparts = int(emb.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    # explicit partition COUNT: a bare repartition(cols) of small rows
    # gets AQE-coalesced below full parallelism (state.py landmine)
    pairs = (rows.repartition(nparts, "band", "bucket")
             .sortWithinPartitions("band", "bucket", "vec_id")
             .mapInPandas(bucket_dots, "id_a long, id_b long, dot double"))
    # a pair surviving in several bands emits identical dot bits each
    # time (same inputs, same fold), so dedup-then-round == the joined
    # path's dedup-before-rerank
    return (pairs.dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b", F.round("dot", 4).alias("cosine"))
            .filter(F.col("cosine") >= min_cosine))
