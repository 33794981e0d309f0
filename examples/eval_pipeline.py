#!/usr/bin/env python
"""Measure, don't guess — the operating-point workflow on this engine.

Every approximate structure in a 100 TB pipeline has a knob (MinHash
band geometry, SimHash hamming budget, hyperplane bits, IVF nprobe,
SemDeDup τ, a cheap quality scorer's threshold), and every knob should
be set by a MEASURED curve, not a rule of thumb. This example runs the
whole decision stack:

1. candidate-generator eval matrix — MinHash-LSH vs SimHash, both
   scored against the same exact τ-Jaccard truth (precision/recall)
2. band-geometry sweep — candidate volume per (b, r) from one
   signature pass, S-curve knees alongside
3. hyperplane-bits sweep + measured recall@10 — cost AND quality per
   operating point
4. IVF nprobe recall curve — the third blocking knob
5. SemDeDup τ sweep — pairs/drops per threshold from one blocked pass
6. scorer calibration — can the one-scan linear scorer pre-prune the
   crawl before the 48-string-pass C4 gate?
7. label separability — whether cosine can see the labels at all
   (closed form, zero pair enumeration)

Run: python examples/eval_pipeline.py [sf_dir]   (default sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from time_series_data_trimmer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def show(title: str, name: str, spark) -> None:
    print(f"\n=== {title} ({name}) ===")
    for row in entry.queries()[name](spark, SF_DIR).collect():
        print("   ", row.asDict())


def main() -> None:
    spark = get_spark("eval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    show("Generator eval: MinHash-LSH vs exact truth", "dedup_lsh_eval_report", spark)
    show("Generator eval: SimHash vs the same truth", "dedup_simhash_eval_report", spark)
    show("Band-geometry operating points", "dedup_lsh_band_sweep", spark)
    show("Hyperplane-bits cost", "emb_lsh_bits_sweep", spark)
    show("Hyperplane-bits measured recall", "emb_lsh_recall_by_bits", spark)
    show("IVF nprobe recall curve", "sim_ivf_nprobe_recall", spark)
    show("SemDeDup threshold economics", "dedup_semantic_tau_sweep", spark)
    show("Cheap-scorer calibration vs the C4 gate", "text_score_calibration", spark)
    show("Label separability (closed form)", "emb_separability_by_label", spark)
    print("\nDecision inputs above; the registered dedup/search queries")
    print("consume whichever operating point these curves justify.")


if __name__ == "__main__":
    main()
