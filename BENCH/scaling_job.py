#!/usr/bin/env python
"""One scaling-run leg: the streaming GLCM job at a given local[N].

Usage: python BENCH/scaling_job.py <cpus> <pages_dir> <n_pages>
Prints one JSON line {"cpus": N, "wall_sec": t, "docs_per_sec": r}.

Run in a fresh process per leg so each parallelism level gets its own JVM
(the sandbox proxy for separate cluster sizes, per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
os.environ["PYTHONPATH"] = (os.path.join(REPO, "src") + os.pathsep
                            + os.environ.get("PYTHONPATH", ""))


def main() -> None:
    cpus = int(sys.argv[1])
    pages_dir = sys.argv[2]
    n_pages = int(sys.argv[3])

    from glcmstream import stream
    from glcmstream.session import get_spark

    # pin this leg to exactly `cpus` cores (inherited by the JVM, its GC/
    # IO helper threads, and all python workers). Without this, the N-core
    # leg borrows idle cores for JVM background work that a real N-executor
    # cluster would have to fit inside N cores, flattering the small leg
    # and understating scaling efficiency.
    os.sched_setaffinity(0, range(cpus))

    os.environ.setdefault("GLCMSTREAM_MAX_PARTITION_BYTES", "8m")
    # shuffle/state partitioning stays FIXED across cluster sizes (as it
    # would on a real cluster); only the executor count changes
    spark = get_spark("glcm-scaling", master=f"local[{cpus}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = os.path.join(REPO, ".scratch", f"scaling_ckpt_{cpus}")
    shutil.rmtree(ckpt, ignore_errors=True)

    # warm the JVM + python workers AND the streaming machinery (state
    # store init, streaming python runner) so the measured run is steady
    # state — the first streaming query in a session costs ~10-30s extra
    warm = stream.read_pages_batch(spark, pages_dir).limit(64)
    from glcmstream import plan
    plan.featurize(warm, parallelism=cpus).agg({"contrast": "avg"}).collect()
    wsub = _subset8(pages_dir)
    wck = os.path.join(REPO, ".scratch", f"warm_ckpt_{cpus}")
    shutil.rmtree(wck, ignore_errors=True)
    wq = (stream.windowed_feature_agg(stream.pages_stream(spark, wsub))
          .writeStream.outputMode("update")
          .foreachBatch(lambda df, eid: df.count())
          .option("checkpointLocation", wck)
          .trigger(availableNow=True).start())
    wq.awaitTermination()

    t0 = time.perf_counter()
    # single availableNow batch: a crawl backlog processed as one epoch —
    # per-epoch fixed costs (state commit, WAL, planning, ~3s) are paid
    # once instead of per slice, which is exactly how a large backlog is
    # drained in production. The multi-epoch cadence is exercised by
    # bench.py and the streaming test suite.
    sdf = stream.pages_stream(spark, pages_dir, max_files_per_trigger=None)
    # no repartition: scan splits (maxPartitionBytes) provide parallelism,
    # so the html binary never crosses a shuffle — only the six feature
    # doubles shuffle into the windowed aggregation
    agg = stream.windowed_feature_agg(sdf)
    q = (agg.writeStream.outputMode("update")
         .foreachBatch(lambda df, eid: df.count())
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.perf_counter() - t0

    import json as _json
    progress = [_json.loads(p.json) for p in q.recentProgress]
    data = [p for p in progress if p["numInputRows"] > 0]
    rows = sum(p["numInputRows"] for p in data)
    assert rows == n_pages, (rows, n_pages)

    checksum = (None if os.environ.get("GLCM_SKIP_DET")
                else _determinism_checksum(spark, pages_dir))
    print(json.dumps({
        "cpus": cpus, "wall_sec": round(wall, 2),
        "docs_per_sec": round(rows / wall, 1),
        "total_docs_per_sec": round(n_pages / wall, 1),
        "epochs": len(data),
        "state_checksum": checksum,
    }))


def _subset8(pages_dir: str) -> str:
    import shutil as _sh
    subset = os.path.join(REPO, ".scratch",
                          os.path.basename(pages_dir) + "_det8")
    if not os.path.exists(os.path.join(subset, "part-0007.parquet")):
        os.makedirs(subset, exist_ok=True)
        for fn in sorted(os.listdir(pages_dir))[:8]:
            _sh.copy(os.path.join(pages_dir, fn), subset)
    return subset


def _determinism_checksum(spark, pages_dir: str) -> str:
    """Bit-exact output identity across cluster sizes (north rule:
    'identical GLCM feature values for identical input stream +
    watermark'). The stateful path accumulates integer-valued count sums,
    which float64 addition computes exactly in any order, so every emitted
    row — keys, counts, all six features at full precision — must be
    byte-identical between local[8] and local[32]. Checksum = xor of
    xxhash64(epoch, every column as string) over all update-mode
    emissions."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from glcmstream import state
    from glcmstream import stream as stream_mod

    subset = _subset8(pages_dir)
    ckpt = os.path.join(REPO, ".scratch", "det_ckpt")
    _sh.rmtree(ckpt, ignore_errors=True)
    sdf = stream_mod.pages_stream(spark, subset, max_files_per_trigger=2)
    out = state.stateful_glcm_agg(sdf)
    acc = []

    def fb(df, eid):
        h = (df.withColumn("_h", F.xxhash64(
                F.lit(int(eid)), *[F.col(c).cast("string")
                                   for c in df.columns]))
             .agg(F.expr("bit_xor(_h)")).collect()[0][0])
        acc.append(int(h) if h is not None else 0)

    q = (out.writeStream.outputMode("update").foreachBatch(fb)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    x = 0
    for v in acc:
        x ^= v & 0xFFFFFFFFFFFFFFFF
    return format(x, "016x")


if __name__ == "__main__":
    main()
