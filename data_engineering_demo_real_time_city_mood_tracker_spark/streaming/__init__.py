from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.mood_pipeline import mood_stream, unified_events
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.sources import parse_news, parse_traffic, parse_weather

__all__ = [
    "mood_stream",
    "unified_events",
    "parse_news",
    "parse_traffic",
    "parse_weather",
]
