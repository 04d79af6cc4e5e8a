from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
