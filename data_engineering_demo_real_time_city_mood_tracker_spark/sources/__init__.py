from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table, load_tables, read_jsonl_valid

__all__ = ["load_table", "load_tables", "read_jsonl_valid"]
