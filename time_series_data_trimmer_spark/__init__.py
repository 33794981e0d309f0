"""time_series_data_trimmer_spark — PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ``aviator1505/Time-Series-Data-Trimmer``
(a pandas/Qt time-series cleaning & annotation studio), re-expressed as
lazy DataFrame plans over partitioned Parquet so the same operators run
unchanged from a 6k-row smoke file to a 100 TB multi-trial lake.

Design stance (see SURVEY.md §7):

* Every table carries a ``trial_id``-like partition key (``user_id`` for
  the driver's ``events`` table); the reference's "one DataFrame per
  trial" becomes ``Window.partitionBy(trial_key)`` so chained operators
  share one shuffle.
* Operators are Column-expression builders wherever SQL semantics allow
  (Catalyst + whole-stage codegen); Arrow-batched ``applyInPandas``
  kernels only for whole-series DSP (Savitzky-Golay, Butterworth,
  spline interpolation, resampling).
* Undo/history is lineage, not snapshots: recipes (JSON op lists) are
  compiled into a single lazy transform chain and executed once.
"""

from time_series_data_trimmer_spark.session import get_spark, load_table, load_tables
from time_series_data_trimmer_spark.schema import classify_columns, ensure_bad_mask, ensure_time_axis
from time_series_data_trimmer_spark.trialframe import TrialFrame

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "classify_columns",
    "ensure_bad_mask",
    "ensure_time_axis",
    "TrialFrame",
]

__version__ = "0.1.0"
