#!/usr/bin/env python
"""spark-submit --py-files packaging smoke (BASELINE.json:14).

Builds glcmstream.zip, then runs this file via spark-submit with
--py-files so the engine executes exactly as it would on a cluster:

    python scripts/submit_smoke.py --build   # create .scratch/glcmstream.zip
    $SPARK_HOME/bin/spark-submit --master 'local[4]' \
        --py-files .scratch/glcmstream.zip scripts/submit_smoke.py

The job featurizes a tiny seeded pages batch and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    pkg = os.path.join(REPO, "src", "glcmstream")
    out = os.path.join(REPO, ".scratch", "glcmstream.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w") as z:
        for fn in sorted(os.listdir(pkg)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg, fn), arcname=f"glcmstream/{fn}")
    print(out)
    return out


def job() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from glcmstream import fixtures, plan

    spark = SparkSession.builder.getOrCreate()
    pdf = fixtures.gen_pages(200, seed=7)
    pdf["lang"] = [str(v) for v in pdf["lang"]]
    df = spark.createDataFrame(
        pdf, schema=("url string, warc_ts timestamp, html binary, "
                     "text string, lang string"))
    feats = plan.featurize(df)
    row = (feats.groupBy()
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.avg("contrast"), 4).alias("avg_contrast"))
           .collect()[0])
    print(json.dumps({"n": row["n"], "avg_contrast": row["avg_contrast"],
                      "ok": row["n"] == 220}))
    spark.stop()


if __name__ == "__main__":
    if "--build" in sys.argv:
        build_zip()
    else:
        job()
