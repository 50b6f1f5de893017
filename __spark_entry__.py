"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship GLCM featurize+aggregate query on sf0.001;
queries()/oracle_sql() expose the full operator surface of SURVEY.md §2
with DuckDB twins where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_REPO, "src")
if _SRC not in sys.path:
    sys.path.insert(0, _SRC)
os.environ["PYTHONPATH"] = _SRC + os.pathsep + os.environ.get(
    "PYTHONPATH", "")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: html -> gray plane ->
    GLCM -> Haralick features -> per-(lang, host) windowed aggregate."""
    from pyspark.sql import functions as F

    from glcmstream import config, plan
    from glcmstream.session import ensure_pyfiles

    ensure_pyfiles(spark)
    spark.conf.set("spark.sql.session.timeZone", config.SESSION_TZ)
    pages = plan.pages_from_documents(spark, "/root/testdata/sf0.001")
    feats = plan.featurize(pages)
    return (feats.groupBy("lang", "host",
                          F.date_trunc("hour", "warc_ts").alias("hour"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 *[F.round(F.avg(c), 4).alias(f"avg_{c}")
                   for c in config.HARALICK_FEATURES]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from glcmstream import queries as q
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from glcmstream import queries as q
    return dict(q.ORACLE)
