from time_series_data_trimmer_spark.functions.expressions import (
    frame_transform,
    seasonal_fold,
    quat_to_yaw,
    heading_from_forward,
    wrap_degrees,
)

__all__ = [
    "frame_transform",
    "seasonal_fold",
    "quat_to_yaw",
    "heading_from_forward",
    "wrap_degrees",
]
