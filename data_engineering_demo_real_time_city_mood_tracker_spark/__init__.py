"""PySpark-native analytics engine with the query and data-processing
capabilities of rafgasparyan/Data_engineering_demo_Real-Time-City-Mood-Tracker,
re-expressed Spark-first (DataFrame/SQL + Structured Streaming), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

See SURVEY.md for the capability inventory and design decisions.
"""

from data_engineering_demo_real_time_city_mood_tracker_spark.session import get_spark

__all__ = ["get_spark"]
