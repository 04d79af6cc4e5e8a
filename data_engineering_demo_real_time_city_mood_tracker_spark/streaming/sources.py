"""Stream sources: Kafka wiring + JSON parsing, schema-for-schema with
the reference consumers (jobs/spark_traffic_consumer.py:16-25,
spark_weather_consumer.py:16-25, spark_news_consumer.py:15-24).

The parse functions take any DataFrame with a string ``value`` column,
so they work identically on a Kafka stream, a file stream, or a batch
frame (which is how tests exercise them without a broker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.schemas import NEWS_SCHEMA, TRAFFIC_SCHEMA, WEATHER_SCHEMA


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "kafka:9092",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka readStream (requires the kafka connector jar on the
    cluster; not exercisable in this container — gated by the caller).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def _parse(df: DataFrame, schema, alias: str) -> DataFrame:
    return (
        df.selectExpr("CAST(value AS STRING) AS value")
        .select(F.from_json(F.col("value"), schema).alias(alias))
        .select(f"{alias}.*")
    )


def parse_traffic(df: DataFrame) -> DataFrame:
    """value JSON → (intersection, vehicle_id, speed, event_time)."""
    out = _parse(df, TRAFFIC_SCHEMA, "t")
    return out.withColumn("event_time", F.col("timestamp")).drop("timestamp")


def parse_weather(df: DataFrame) -> DataFrame:
    out = _parse(df, WEATHER_SCHEMA, "w")
    return out.withColumn("event_time", F.col("timestamp")).drop("timestamp")


def parse_news(df: DataFrame) -> DataFrame:
    out = _parse(df, NEWS_SCHEMA, "n")
    return out.withColumn("event_time", F.col("timestamp")).drop("timestamp")
