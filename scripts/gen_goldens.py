#!/usr/bin/env python
"""Regenerate the rows-only golden fixtures (tests/goldens/*.parquet).

Run ONLY when a rows-only query's semantics change intentionally; the
new snapshot must be re-anchored by the independent oracle tests
(kernel loop-oracles, recall-vs-planted, streaming==batch parity)
passing in the same commit. See src/glcmstream/goldens.py.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry

    from glcmstream import goldens
    from glcmstream.session import get_spark

    spark = get_spark("gen-goldens")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in goldens.GOLDEN_QUERIES:
        df = qs[name](spark, goldens.GOLDEN_SF_DIR)
        p = goldens.write_golden(name, df)
        print(f"{name}: {len(goldens.read_golden(name))} rows -> {p}",
              flush=True)


if __name__ == "__main__":
    main()
