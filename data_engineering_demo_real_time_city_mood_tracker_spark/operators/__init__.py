from data_engineering_demo_real_time_city_mood_tracker_spark.operators import dedup, multimodal, similarity, windows

__all__ = ["dedup", "multimodal", "similarity", "windows"]
