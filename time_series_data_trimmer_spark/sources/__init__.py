from time_series_data_trimmer_spark.sources.readers import read_trial_csv

__all__ = ["read_trial_csv"]
