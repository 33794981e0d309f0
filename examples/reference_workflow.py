#!/usr/bin/env python
"""The reference's documented headless workflow (its README §19),
executed end-to-end on this engine — every verb is the Spark-native
twin of the `DataModel`/`FilterEngine` call it replaces.

Run: python examples/reference_workflow.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_data_trimmer_spark import TrialFrame, get_spark
from time_series_data_trimmer_spark.plans.recipe import apply_recipe


def make_trials(d: str, n_trials: int = 3, n_rows: int = 240) -> list[str]:
    """Synthetic 120 Hz kinematics CSVs in the bundled-file shape,
    including NaN sentinels and a spike artifact."""
    paths = []
    for k in range(n_trials):
        p = os.path.join(d, f"P{k:02d}_Stand_45.csv")
        with open(p, "w") as f:
            f.write("normalized_time,gaze_heading_deg,head_heading_deg,participant_id\n")
            for i in range(n_rows):
                t = i / 120.0
                gaze = 20.0 * __import__("math").sin(t * 3.0 + k)
                head = 15.0 * __import__("math").sin(t * 3.0 + k + 0.3)
                if i == 100:
                    gaze += 500.0  # spike artifact
                cell = "" if i == 50 else f"{gaze:.4f}"  # NaN sentinel
                f.write(f"{t:.6f},{cell},{head:.4f},P{k:02d}\n")
        paths.append(p)
    return paths


def main() -> None:
    spark = get_spark("reference-workflow")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="tsdt_demo_")
    paths = make_trials(d)

    # DataModel.load_csv → one distributed scan over every trial
    tf = TrialFrame(spark).load_csv(paths)
    print(f"loaded {tf.df.count()} rows, {len(paths)} trials @ {tf.sample_rate} Hz")
    print("channel groups:", tf.channel_groups())

    # FilterEngine.apply chain (lazy — one job when collected)
    tf.apply(["gaze_heading_deg"], "interpolate", {"method": "linear"})
    tf.apply(["gaze_heading_deg"], "savgol", {"window": 11, "polyorder": 2})
    tf.apply(["gaze_heading_deg", "head_heading_deg"], "normalize_zscore", {},
             selection=(0.5, 1.5))

    # artifact suggestions (main.py:1279-1308) across ALL trials at once
    segs = tf.suggest("gaze_heading_deg").toPandas()
    print(f"suggested segments: {len(segs)}")
    print(segs.head(5).to_string())

    # edits + annotations
    tf.delete_segment(0.8, 0.9)
    tf.mark_bad(1.2, 1.3)
    tf.annotate(0.4, 0.6, "blink", track="eye")

    # persistence: partitioned parquet + JSON sidecar
    out = os.path.join(d, "clean")
    tf.save_clean(out)
    tf.save_annotations(os.path.join(d, "annotations.json"))
    print("history ops:", [r.description for r in tf.history])

    # recipe replay (main.py:744-794) — the whole history as ONE job
    # over a fresh load of all trials
    recipe = tf.recipe()
    fresh = TrialFrame(spark).load_csv(paths)
    replayed = apply_recipe(fresh.df, recipe, trial_key="trial_id",
                            sample_rate=fresh.sample_rate)
    print(f"recipe replayed over {replayed.count()} rows "
          f"({len(recipe['operations'])} ops, one lazy plan)")
    print("demo artifacts in", d)


if __name__ == "__main__":
    main()
