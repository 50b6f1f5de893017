"""Skew handling: salted two-phase aggregation (SURVEY.md §2.B 🛠).

Hot grouping keys (a handful of hosts own 40%+ of a web crawl) overload
single reducers. For algebraic aggregates (sum/count — and the GLCM count
matrix, which is a sum monoid) we salt: phase 1 aggregates on
(key, salt) spreading each hot key over SALT_BUCKETS reducers, phase 2
combines the partials per key. Exactness is preserved because every
aggregate that passes through is re-aggregatable (sums of sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import config


def heavy_hitters(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """EXACT distributed heavy hitters (frequency > N/k) via the
    sketch-for-candidates / exact-for-answer pattern the engine uses for
    dedup: per-batch local frequency summaries produce a candidate set,
    then one exact aggregation over only the candidates verifies.

    Correctness is provable, not probabilistic: if an item's global
    count exceeds N/k, then on at least one Arrow batch its local count
    exceeds that batch's n_b/k (pigeonhole: if count_b <= n_b/k on every
    batch, summing gives total <= N/k) — so the union of per-batch
    "locally heavy" values is a guaranteed superset of the true heavy
    hitters, at most k values per batch. Cost: one narrow scan emitting
    <= k rows per Arrow batch (no full-key shuffle — this is how you
    FIND the hot hosts that salted_sum_agg then spreads), plus ONE exact
    verify scan: non-candidates collapse to a null bucket via broadcast
    join, and a ROLLUP produces the per-candidate counts AND the grand
    total N in the same aggregation — no driver-side count() action, no
    third scan; the N/k threshold is applied with a window over the
    <= k+2 rollup rows.

    Returns (value, n) for every value with n > N/k, exact counts."""
    import pandas as pd
    from pyspark.sql import Window

    def local_heavy(it):
        for pdf in it:
            vc = pdf[col].value_counts()
            cand = vc[vc > len(pdf) / k]
            if len(cand):
                yield pd.DataFrame({col: cand.index})

    cands = (df.select(col).mapInPandas(local_heavy, f"{col} string")
             .distinct().withColumn("_cand", F.lit(True)))
    marked = (df.select(col).join(F.broadcast(cands), col, "left")
              .select(F.when(F.col("_cand"), F.col(col)).alias("value")))
    rolled = marked.rollup("value").agg(
        F.count(F.lit(1)).alias("n"), F.grouping("value").alias("_g"))
    # _g=1 row is the grand total N; window is over <= k+2 rows, so the
    # single-partition analytic is trivially cheap
    w = Window.partitionBy(F.lit(1))
    return (rolled
            .withColumn("_total", F.max(F.when(F.col("_g") == 1,
                                               F.col("n"))).over(w))
            .filter((F.col("_g") == 0) & F.col("value").isNotNull()
                    & (F.col("n") > F.col("_total") / k))
            .select("value", "n"))


def salted_sum_agg(df: DataFrame, keys: list[str],
                   sums: dict[str, str], counts: str | None = "n",
                   buckets: int = config.SALT_BUCKETS) -> DataFrame:
    """Two-phase salted sum/count aggregation.

    sums: {output_alias: input_column_expr} summed exactly.
    counts: alias for a row count (None to skip).
    Salt is derived from xxhash64 of all columns-ish randomness-free: we
    use a deterministic per-row hash (monotonically_increasing_id is NOT
    used — it's partition-layout dependent); spark_partition_id would also
    be layout-dependent, so the salt hashes a stable payload column.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in df.columns
                               if k not in keys][:1] or [F.lit(1)]),
                  F.lit(buckets)).alias("_salt")
    phase1_aggs = [F.sum(F.col(src)).alias(f"_s_{alias}")
                   for alias, src in sums.items()]
    if counts:
        phase1_aggs.append(F.count(F.lit(1)).alias("_c"))
    p1 = (df.withColumn("_salt", salt)
            .groupBy(*keys, "_salt").agg(*phase1_aggs))
    phase2_aggs = [F.sum(F.col(f"_s_{alias}")).alias(alias)
                   for alias in sums]
    if counts:
        phase2_aggs.append(F.sum("_c").alias(counts))
    return p1.groupBy(*keys).agg(*phase2_aggs)
