"""IcebergLite as a query-facing SOURCE (round-1 verdict gap): time-travel
reads, snapshot isolation under concurrent commits, days(warc_ts)
partition layout with pruning, single-evaluation lineage."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from glcmstream.sink import IcebergLiteTable

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch")


@pytest.fixture()
def table(spark):
    d = os.path.join(SCRATCH, "iceberg_src_test")
    shutil.rmtree(d, ignore_errors=True)
    t = IcebergLiteTable(d)
    yield t
    t.destroy()


def _pages(spark, ids, day):
    return spark.createDataFrame(
        [(f"https://h{i % 3}.example.com/{i}",
          f"2026-01-{day:02d} 0{i % 10}:00:00", i) for i in ids],
        "url string, ts string, doc_id long") \
        .withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts")


def test_time_travel_reads_exact_snapshot(spark, table):
    table.commit(_pages(spark, range(0, 10), 1), 0,
                 partition_days_col="warc_ts")
    table.commit(_pages(spark, range(10, 25), 2), 1,
                 partition_days_col="warc_ts")
    table.commit(_pages(spark, range(25, 30), 3), 2,
                 partition_days_col="warc_ts")
    assert table.read(spark, as_of_epoch=0).count() == 10
    assert table.read(spark, as_of_epoch=1).count() == 25
    assert table.read(spark).count() == 30
    ids = {r.doc_id for r in table.read(spark, as_of_epoch=1).collect()}
    assert ids == set(range(25))


def test_snapshot_isolation_under_concurrent_commit(spark, table):
    table.commit(_pages(spark, range(0, 10), 1), 0)
    snap = table.read(spark)            # snapshot resolved here
    table.commit(_pages(spark, range(10, 20), 2), 1)  # concurrent writer
    assert snap.count() == 10           # reader still sees its snapshot
    assert table.read(spark).count() == 20  # new reader sees both


def test_days_partition_layout_and_pruning(spark, table):
    table.commit(_pages(spark, range(0, 10), 1), 0,
                 partition_days_col="warc_ts")
    epoch_dir = os.path.join(table.data_dir, "epoch=0")
    days = [d for d in os.listdir(epoch_dir) if d.startswith("warc_day=")]
    assert days == ["warc_day=2026-01-01"]

    table.commit(_pages(spark, range(10, 20), 2), 1,
                 partition_days_col="warc_ts")
    df = table.read(spark).filter(F.col("warc_day") == "2026-01-02")
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str
    assert df.count() == 10


def test_incremental_stream_read_picks_up_new_commits(spark, table):
    """Iceberg streaming-source semantics: a running manifest-log stream
    consumes committed epochs in order and sees epochs committed AFTER
    the stream started; uncommitted (torn) data stays invisible."""
    import time

    table.commit(_pages(spark, range(0, 10), 1), 0)
    ckpt = os.path.join(SCRATCH, "ice_stream_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    seen: list[set] = []

    def fb(df, eid):
        ids = {r.doc_id for r in df.collect()}
        if ids:
            seen.append(ids)

    q = (table.read_stream(spark).writeStream.outputMode("append")
         .foreachBatch(fb).option("checkpointLocation", ckpt).start())
    try:
        deadline = time.time() + 60
        while not seen and time.time() < deadline:
            time.sleep(0.3)
        assert seen and seen[0] == set(range(10))

        # torn write: data without a manifest must stay invisible
        torn = os.path.join(table.data_dir, "epoch=99")
        _pages(spark, range(90, 95), 3).write.parquet(torn)
        # an in-progress manifest tmp (hidden name) must also be
        # invisible to the manifest-log stream, even with corrupt content
        with open(os.path.join(table.manifest_dir,
                               ".epoch-77.json.tmp-abc"), "w") as f:
            f.write("{ not json")
        # a real commit lands while the stream is running
        table.commit(_pages(spark, range(10, 20), 2), 1)
        while len(seen) < 2 and time.time() < deadline:
            time.sleep(0.3)
        assert len(seen) >= 2 and seen[1] == set(range(10, 20))
        all_seen = set().union(*seen)
        assert not (all_seen & set(range(90, 95)))  # torn data invisible
    finally:
        q.stop()
        q.awaitTermination()


def test_lineage_certifies_written_rows(spark, table):
    table.commit(_pages(spark, range(0, 7), 1), 0)
    m = table.manifests()[0]
    assert m["row_count"] == 7
    assert sum(p["row_count"] for p in m["partitions"]) == 7
    for p in m["partitions"]:
        assert len(p["input_hash"]) == 16


def test_lineage_keys_unique_for_partitioned_commit(spark, table):
    """With a days() partition layout each task writes one part file per
    warc_day dir, so part numbers repeat — the lineage key is the FILE
    (round-2 advice); partition_id is de-duplicated to a per-file index."""
    df = _pages(spark, range(0, 10), 1).unionByName(
        _pages(spark, range(10, 20), 2))
    table.commit(df, 0, partition_days_col="warc_ts")
    m = table.manifests()[0]
    files = [p["file"] for p in m["partitions"]]
    pids = [p["partition_id"] for p in m["partitions"]]
    assert len(set(files)) == len(files) > 1
    assert len(set(pids)) == len(pids)
    assert sum(p["row_count"] for p in m["partitions"]) == 20
