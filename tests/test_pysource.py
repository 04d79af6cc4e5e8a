"""The `citymood` Python Data Source (Spark 4 API): batch reads must
be BITWISE the Column-expression producer twins (same md5 generation,
replicated with hashlib), the stream reader's offset==row-id contract
must replay deterministically, and bad options fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.sources import pysource
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming import producers

START = "2024-01-01 00:00:00"


@pytest.fixture(scope="module")
def registered(spark):
    pysource.register(spark)
    return spark


@pytest.mark.parametrize("kind,builder", [
    ("traffic", producers.traffic_events),
    ("weather", producers.weather_events),
    ("news", producers.news_events),
])
def test_batch_read_bitwise_equals_column_twins(registered, kind, builder):
    spark = registered
    n = 500
    got = sorted(
        tuple(r)
        for r in spark.read.format("citymood")
        .option("kind", kind)
        .option("n", n)
        .option("start_ts", START)
        .load()
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in builder(producers.batch_source(spark, n, START)).collect()
    )
    assert got == want  # bitwise: doubles included


def test_batch_read_partitions_cover_range(registered):
    spark = registered
    df = (
        spark.read.format("citymood")
        .option("kind", "traffic").option("n", 1000)
        .option("partitions", 7).option("start_ts", START)
        .load()
    )
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 7


def test_stream_reader_replays_deterministically(registered, tmp_path):
    spark = registered
    q = (
        spark.readStream.format("citymood")
        .option("kind", "news").option("rows_per_batch", 50)
        .option("max_rows", 150)  # finite feed -> processAllAvailable ends
        .option("start_ts", START)
        .load()
        .writeStream.format("memory")
        .queryName("citymood_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            tuple(r)
            for r in spark.sql(
                "SELECT * FROM citymood_stream ORDER BY timestamp"
            ).collect()
        ]
    finally:
        q.stop()
    assert len(got) == 150
    # offset==row-id: the first len(got) generated rows, exactly once
    want = sorted(pysource._gen(
        "news", 0, len(got), __import__("datetime").datetime.fromisoformat(START), 1
    ))
    assert sorted(got) == want


def test_unknown_kind_fails_loudly(registered):
    with pytest.raises(Exception, match="kind must be one of"):
        registered.read.format("citymood").option("kind", "seismic").load()
