"""Distributed connected components: pointer-jumping convergence on long
chains (the ADVICE-flagged O(diameter) failure mode) and the
non-convergence guard."""

import pytest
from pyspark.sql import functions as F

from arabic_ocr_spark.operators.dedup import min_label_components


def _path_graph(spark, n):
    """0-1-2-...-(n-1): diameter n-1, the worst case for one-hop propagation."""
    return spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )


def test_long_chain_converges_in_log_rounds(spark):
    """A 120-node chain would need ~119 one-hop rounds; pointer jumping must
    finish within 10."""
    labels = min_label_components(_path_graph(spark, 120), max_iters=10)
    rows = labels.collect()
    assert len(rows) == 120
    assert all(r["rep"] == 0 for r in rows)


def test_multiple_components_get_their_own_min(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21)], "doc_a long, doc_b long"
    )
    labels = {r["doc_a"]: r["rep"] for r in min_label_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_nonconvergence_raises_not_silent(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(_path_graph(spark, 200), max_iters=2)
