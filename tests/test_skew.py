"""skew.py: heavy_hitters exactness guarantee + salted agg parity.

heavy_hitters claims a provable (pigeonhole) candidate superset: its
answer must equal the brute-force full GROUP BY + HAVING for ANY k and
ANY partition layout. We check two k values and a skewed repartition.
"""

from pyspark.sql import functions as F

from glcmstream import skew


def _brute(df, col, k):
    total = df.count()
    return {(r["value"], r["n"]) for r in
            df.groupBy(F.col(col).alias("value"))
              .agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") > total / k).collect()}


def _hosted(spark, sf_dir):
    from glcmstream import plan
    pages = plan.pages_from_documents(spark, sf_dir)
    return pages.select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))


def test_heavy_hitters_exact_two_geometries(spark, sf_smoke):
    hosted = _hosted(spark, sf_smoke)
    for k in (3, 12, 40):
        got = {(r["value"], r["n"]) for r in
               skew.heavy_hitters(hosted, "host", k=k).collect()}
        assert got == _brute(hosted, "host", k), f"k={k}"
    # k=12 must surface the deliberate 40% hot host and only it
    hh12 = {v for v, _ in _brute(hosted, "host", 12)}
    assert hh12 == {"host0000.example.com"}


def test_heavy_hitters_layout_independent(spark, sf_smoke):
    """Answer identical under an adversarial layout where the hot key is
    spread thin across many partitions (each local count small)."""
    hosted = _hosted(spark, sf_smoke).repartition(32)  # round-robin
    got = {(r["value"], r["n"]) for r in
           skew.heavy_hitters(hosted, "host", k=12).collect()}
    assert got == _brute(hosted, "host", 12)


def test_heavy_hitters_candidates_bounded_many_batches(spark):
    """Candidate growth is O(k x partitions), NOT O(k x batches)
    (round-3 verdict #3): an adversarial stream of mostly-unique values
    (each Arrow batch nominates fresh locally-heavy values) across many
    batches per partition must still emit <= k candidates per partition,
    while exactness holds for the planted hot keys."""
    k, parts = 8, 4
    n = 64_000  # 512-row Arrow batches -> ~31 batches per partition
    df = (spark.range(n)
          # 20% hot_a (> N/k), 15% hot_b (> N/k); rest unique
          .withColumn("v", F.when(F.col("id") % 20 < 4, F.lit("hot_a"))
                      .when(F.col("id") % 20 < 7, F.lit("hot_b"))
                      .otherwise(F.concat(F.lit("u"), F.col("id"))))
          .repartition(parts).cache())
    try:
        n_cands = skew.mg_candidates(df, "v", k).count()
        assert n_cands <= k * parts, n_cands
        got = {(r["value"], r["n"]) for r in
               skew.heavy_hitters(df, "v", k=k).collect()}
        assert got == _brute(df.select(F.col("v")), "v", k)
        assert {v for v, _ in got} == {"hot_a", "hot_b"}
    finally:
        df.unpersist()


def test_heavy_hitters_heavy_key_after_stale_counters(spark):
    """Round-4 advice (high): the MG prune must SUBTRACT the cut from
    surviving counters, not just filter. Without the decrement, stale
    large counters keep full weight and repeatedly knock out a heavy
    key that arrives later — breaking the guaranteed-superset proof.
    Repro: one partition, small Arrow batches; a×100 and b×99 arrive
    first, then x×294 spread over later batches. N=493, k=2 →
    threshold 246.5: x (and only x) is heavy and MUST surface."""
    import pandas as pd
    rows = (["a"] * 100) + (["b"] * 99) + (["x"] * 294)
    pdf = pd.DataFrame({"v": rows})
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.createDataFrame(pdf).coalesce(1)
        cands = {r["v"] for r in skew.mg_candidates(df, "v", 2).collect()}
        assert "x" in cands, cands
        got = {(r["value"], r["n"]) for r in
               skew.heavy_hitters(df, "v", k=2).collect()}
        assert got == {("x", 294)}, got
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_heavy_hitters_non_string_key_and_nulls(spark):
    """Schema-derived candidate type (bigint key) + the documented null
    contract: nulls are excluded and the N/k threshold is over the
    non-null count (round-3 advice #3)."""
    n = 4_000
    df = (spark.range(n)
          .withColumn("v", F.when(F.col("id") % 4 == 0, F.lit(None))
                      .when(F.col("id") % 3 == 0, F.lit(7))
                      .otherwise(F.col("id"))).select("v"))
    got = {(r["value"], r["n"]) for r in
           skew.heavy_hitters(df, "v", k=5).collect()}
    nn = df.filter(F.col("v").isNotNull())
    exp = _brute(nn, "v", 5)
    assert got == exp and got  # the planted hot bigint surfaces
    assert all(isinstance(v, int) for v, _ in got)


def test_salted_sum_agg_matches_plain(spark, sf_smoke):
    hosted = _hosted(spark, sf_smoke).withColumn("one", F.lit(1))
    salted = {(r["host"], r["s"], r["n"]) for r in
              skew.salted_sum_agg(hosted, ["host"], {"s": "one"},
                                  counts="n").collect()}
    plain = {(r["host"], r["s"], r["n"]) for r in
             hosted.groupBy("host")
             .agg(F.sum("one").alias("s"),
                  F.count(F.lit(1)).alias("n")).collect()}
    assert salted == plain
