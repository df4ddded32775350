"""Streaming throughput probe: wall vs input size for the two
streaming-state archetypes, with exact cross-factor invariants.

``_stream_events(copies=N)`` lands the sf0.1 events file N times into
the landing dir — a genuinely N-fold stream (100k events at sf0.1, so
factors 1/8/32 push 100k/800k/3.2M rows through a real readStream +
availableNow drain). Two workloads, chosen for their opposite state
shapes:

- ``tumbling``  — watermarked tumbling counts: state is bounded by the
  WINDOW DOMAIN (#10-min windows in the data, invariant in input
  size); every count at factor N must equal exactly N x its factor-1
  value (the copies are byte-identical), which the probe asserts —
  a correctness check that rides along for free.
- ``dedup``     — exactly-once collapse of the duplicated landing
  (dropDuplicates inside the watermark over the event key): state is
  bounded by KEY CARDINALITY (100k keys at every factor); output must
  be byte-invariant in the factor (asserted via count + checksum).

The scale claims under test: wall grows sub-linearly in input (the
fixed drain overhead — JVM stream planning, checkpoint setup, memory
sink — amortizes), state never grows with input for either archetype,
and events/s THROUGH the full drain improves with factor (the honest
throughput number is the big-factor one; small factors measure
overhead, not throughput).

    python scripts/stream_scaling_probe.py     # one JSON line
Env: STREAM_PROBE_FACTORS (default "1,8,32,128"), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from books2scrape_etl_spark.queries import freeze_registry_heap
from books2scrape_etl_spark.session import get_spark
from books2scrape_etl_spark.streaming.windows import (
    _drain_to_memory,
    _stream_events,
    tumbling_counts_window,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = tuple(
    int(x) for x in os.environ.get("STREAM_PROBE_FACTORS", "1,8,32,128").split(",")
)


def _checksum(df, *cols) -> int:
    row = df.select(
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row.h or 0), int(row.n)


def main() -> None:
    freeze_registry_heap()
    spark = get_spark(app_name="stream_scaling_probe")
    n_events = spark.read.parquet(
        os.path.join(SF_DIR, "events.parquet")
    ).count()
    results: dict = {"sf": SF_DIR, "n_events": n_events, "factors": {}}
    base: dict[str, tuple] = {}

    for f in FACTORS:
        # tumbling counts: watermarked agg over the f-fold stream
        ev = _stream_events(spark, SF_DIR, copies=f).withWatermark("ts", "1 hour")
        t0 = time.time()
        counts = _drain_to_memory(tumbling_counts_window(ev), "append")
        t_tumble = round(time.time() - t0, 2)
        # cross-factor law: every window count is exactly f x factor-1
        h_scaled, n_windows = _checksum(
            counts.select(
                "w_start", "w_end", "event_type",
                (F.col("n_events") / f).cast("bigint").alias("n"),
            ),
            "w_start", "w_end", "event_type", "n",
        )

        # exactly-once dedup of the duplicated landing
        ev = _stream_events(spark, SF_DIR, copies=f).withWatermark("ts", "1 hour")
        dd = ev.dropDuplicates(["event_id"])
        t0 = time.time()
        surv = _drain_to_memory(dd, "append")
        t_dedup = round(time.time() - t0, 2)
        h_dedup, n_surv = _checksum(surv, "event_id", "user_id", "ts")

        if f == FACTORS[0]:
            base["tumble"] = (h_scaled, n_windows)
            base["dedup"] = (h_dedup, n_surv)
        assert (h_scaled, n_windows) == base["tumble"], (
            f"factor {f}: tumbling counts are not exactly {f}x factor-1"
        )
        assert (h_dedup, n_surv) == base["dedup"], (
            f"factor {f}: dedup output varies with duplication factor"
        )
        assert n_surv == n_events, (n_surv, n_events)

        rows_in = n_events * f
        results["factors"][f] = {
            "rows_in": rows_in,
            "tumbling_s": t_tumble,
            "tumbling_rows_per_s": int(rows_in / t_tumble),
            "dedup_s": t_dedup,
            "dedup_rows_per_s": int(rows_in / t_dedup),
            "n_windows": n_windows,
        }
    print(json.dumps({"metric": "stream_scaling", **results}))


if __name__ == "__main__":
    main()
