from time_series_data_trimmer_spark.operators.filters import apply_filter, available_filters

__all__ = ["apply_filter", "available_filters"]
