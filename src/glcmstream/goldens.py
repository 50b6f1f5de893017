"""Golden-output fixtures for rows-only queries (round-3 verdict #4).

13 of the registry's queries have no DuckDB twin — seeded MinHash /
SimHash / hyperplane signatures and the GLCM state pipelines are not
SQL-expressible — so the driver records only a rows+schema check for
them. Goldens close the value gap: each query's full result at sf0.001
is canonicalized (columns sorted by name, rows sorted by every column)
and committed as parquet; tests/test_goldens.py re-runs the query and
pins frame equality, so a VALUE regression in any rows-only operator
fails CI even where the oracle can't follow. Validity of the committed
snapshots is anchored by the independent oracles that already pin these
operators' semantics (kernel loop-oracles and goldens in
tests/test_kernel.py, recall-vs-planted-pairs in test_dedup_recall.py,
streaming==batch parity in test_streaming.py) — the golden freezes the
already-verified behavior against drift.
"""

from __future__ import annotations

import os

import pandas as pd

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tests", "goldens")

GOLDEN_SF_DIR = "/root/testdata/sf0.001"

# every registered query without an oracle_sql twin
GOLDEN_QUERIES = [
    "glcm_lang_profile", "rendertile_profile",
    "streaming_stateful_glcm", "streaming_stateful_glcm_fused",
    "streaming_stateful_glcm_bucketed", "streaming_stateful_glcm_sliding",
    "streaming_stateful_glcm_session", "streaming_sliding_continuous",
    "minhash_lsh_dedup", "simhash_near_pairs", "simhash_buckets",
    "ann_lsh_pairs", "ivf_topk_cosine", "approx_distinct_parts",
]


def canonical_pdf(df) -> pd.DataFrame:
    """Spark DataFrame -> deterministic pandas frame: columns sorted by
    name, rows sorted by every column, fresh index — the same
    canonicalization the driver's value-hash uses (sort columns by name
    before hashing)."""
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns), kind="mergesort") \
        .reset_index(drop=True)


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.parquet")


def write_golden(name: str, df) -> str:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    p = golden_path(name)
    canonical_pdf(df).to_parquet(p, index=False)
    return p


def read_golden(name: str) -> pd.DataFrame:
    return pd.read_parquet(golden_path(name))
