"""Complex-event-processing pattern operator (north rule: "streaming /
CEP engine"): detect `click -> purchase within `window`, with no
intervening error` per user, as an applyInPandasWithState stateful
pattern matcher.

State per user = (last_click_us, last_error_us): a purchase matches iff
a click happened within the window and no error arrived after that
click. Rows are processed in event-time order within each micro-batch;
cross-batch order is the source's replay order (the correctness query
drives a single-batch replay of the driver's time-sorted events table,
where the semantics are exact — the same contract as the reference's
ordered tile scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)

STATE_SCHEMA = StructType([
    StructField("last_click_us", LongType()),
    StructField("last_error_us", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("click_us", LongType()),
    StructField("purchase_us", LongType()),
])

WINDOW_US = 30 * 60 * 1_000_000


def match_pattern(key, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        last_click, last_error = state.get
    else:
        last_click, last_error = -1, -1
    out: list[tuple[int, int, int]] = []
    uid = key[0]
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("ts_us", kind="mergesort")
        for ts, et in zip(pdf["ts_us"], pdf["event_type"]):
            ts = int(ts)
            if et == "click":
                last_click = ts
            elif et == "error":
                last_error = ts
            elif et == "purchase":
                if (last_click >= 0 and ts - last_click <= WINDOW_US
                        and last_error < last_click):
                    out.append((uid, last_click, ts))
    state.update((int(last_click), int(last_error)))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "click_us",
                                         "purchase_us"])


def cep_click_purchase(events: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """events stream (user_id, ts, event_type) -> matched pattern rows."""
    keyed = (events
             .withWatermark("ts", watermark)
             .withColumn("ts_us", F.unix_micros("ts"))
             .select("user_id", "ts_us", "event_type", "ts"))
    return (keyed.groupBy("user_id")
            .applyInPandasWithState(match_pattern, OUTPUT_SCHEMA,
                                    STATE_SCHEMA, "update",
                                    GroupStateTimeout.EventTimeTimeout))
