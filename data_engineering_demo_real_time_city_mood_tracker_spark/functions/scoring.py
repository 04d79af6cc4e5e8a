"""Rule-engine scoring as pure Column expressions.

The reference implements these as row-at-a-time Python UDFs
(/root/reference/jobs/spark_mood_tracker.py:93-111 ``label_mood``,
/root/reference/jobs/spark_traffic_consumer.py:27-32 traffic scoring).
Here they are ``F.when`` chains: Catalyst folds them into whole-stage
codegen, so at 100 TB the scoring costs nothing beyond the scan —
there is no Python round-trip per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Weather taxonomy — spark_mood_tracker.py:81-90 / weather_producer.py:17-40.
RELAXING_WEATHER = ["clear", "mainly_clear", "partly_cloudy"]
STRESSFUL_WEATHER = [
    "overcast",
    "fog",
    "depositing_rime_fog",
    "drizzle_light",
    "drizzle_moderate",
    "drizzle_dense",
    "rain_slight",
    "rain_moderate",
    "rain_heavy",
    "rain_showers_slight",
    "rain_showers_moderate",
    "rain_showers_heavy",
    "snow_slight",
    "snow_moderate",
    "snow_heavy",
    "snow_showers_slight",
    "snow_showers_heavy",
    "thunderstorm",
    "thunderstorm_with_hail",
]


def traffic_condition(speed: Column) -> Column:
    """speed<30 → heavy, <60 → moderate, else light (traffic consumer)."""
    return (
        F.when(speed < 30, F.lit("heavy"))
        .when(speed < 60, F.lit("moderate"))
        .otherwise(F.lit("light"))
    )


def mood_label(avg_speed: Column, weather: Column, sentiment: Column) -> Column:
    """Mood rule engine, order-faithful to ``label_mood``.

    Null speed/weather → unknown; negative sentiment → tense;
    fast+relaxing → relaxed; slow+stressful → stressed;
    slow+relaxing → slowed_but_chill; fast+stressful → fast_but_gloomy;
    else normal.
    """
    relaxing = weather.isin(RELAXING_WEATHER)
    stressful = weather.isin(STRESSFUL_WEATHER)
    return (
        F.when(avg_speed.isNull() | weather.isNull(), F.lit("unknown"))
        .when(sentiment == "negative", F.lit("tense"))
        .when((avg_speed > 60) & relaxing, F.lit("relaxed"))
        .when((avg_speed < 30) & stressful, F.lit("stressed"))
        .when((avg_speed < 30) & relaxing, F.lit("slowed_but_chill"))
        .when((avg_speed > 60) & stressful, F.lit("fast_but_gloomy"))
        .otherwise(F.lit("normal"))
    )


def mood_label_sql(avg_speed: str, weather: str, sentiment: str) -> str:
    """ANSI-SQL rendering of the same rule engine (for oracles/tests)."""
    relaxing = ", ".join(f"'{w}'" for w in RELAXING_WEATHER)
    stressful = ", ".join(f"'{w}'" for w in STRESSFUL_WEATHER)
    return f"""CASE
        WHEN {avg_speed} IS NULL OR {weather} IS NULL THEN 'unknown'
        WHEN {sentiment} = 'negative' THEN 'tense'
        WHEN {avg_speed} > 60 AND {weather} IN ({relaxing}) THEN 'relaxed'
        WHEN {avg_speed} < 30 AND {weather} IN ({stressful}) THEN 'stressed'
        WHEN {avg_speed} < 30 AND {weather} IN ({relaxing}) THEN 'slowed_but_chill'
        WHEN {avg_speed} > 60 AND {weather} IN ({stressful}) THEN 'fast_but_gloomy'
        ELSE 'normal'
    END"""


def traffic_condition_sql(speed: str) -> str:
    return (
        f"CASE WHEN {speed} < 30 THEN 'heavy' "
        f"WHEN {speed} < 60 THEN 'moderate' ELSE 'light' END"
    )
