"""Wave-42: chunk centrality — symmetric-graph identities and the
central-chunk-beats-outlier construction."""

import pytest

from time_series_data_trimmer_spark.operators import text as tx


def _doc(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_symmetric_two_chunk_doc_splits_mass(spark):
    # 24 tokens -> two 12-token chunks sharing vocabulary symmetrically
    text = " ".join(["alpha beta gamma delta"] * 6)
    out = tx.chunk_centrality(_doc(spark, [text]), chunk_tokens=12).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_chunks"] == 2
    assert r["top_chunk_id"] == 0  # tie -> min chunk id
    assert r["centrality"] == pytest.approx(0.5)


def test_central_chunk_wins_over_outlier(spark):
    # chunks 0 and 2 share a vocabulary; chunk 1 is disjoint noise ->
    # the shared-vocabulary chunks out-rank the isolated one, and the
    # doc's top chunk is NOT the lead chunk when the lead is noise
    shared = "spark table join query scan merge sort hash group agg row col"
    noise = "zz yy xx ww vv uu tt ss rr qq pp oo"
    text = " ".join([noise, shared, shared])
    out = tx.chunk_centrality(_doc(spark, [text]), chunk_tokens=12).collect()[0]
    assert out["n_chunks"] == 3
    assert out["top_chunk_id"] in (1, 2)  # a shared chunk, never the noise

    # and with the noise in the middle, lead/trail still beat it
    text2 = " ".join([shared, noise, shared])
    out2 = tx.chunk_centrality(_doc(spark, [text2]), chunk_tokens=12).collect()[0]
    assert out2["top_chunk_id"] in (0, 2)
