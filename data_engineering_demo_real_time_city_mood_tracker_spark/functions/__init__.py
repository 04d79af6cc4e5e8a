from data_engineering_demo_real_time_city_mood_tracker_spark.functions.scoring import (
    RELAXING_WEATHER,
    STRESSFUL_WEATHER,
    mood_label,
    traffic_condition,
)
from data_engineering_demo_real_time_city_mood_tracker_spark.functions.sentiment import NEGATIVE_WORDS, POSITIVE_WORDS, sentiment

__all__ = [
    "RELAXING_WEATHER",
    "STRESSFUL_WEATHER",
    "mood_label",
    "traffic_condition",
    "NEGATIVE_WORDS",
    "POSITIVE_WORDS",
    "sentiment",
]
