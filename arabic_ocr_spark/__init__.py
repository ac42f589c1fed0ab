"""arabic_ocr_spark — a from-scratch PySpark-native main-content extraction
engine with the query/data-processing capabilities of the reference
(Kareem-Emad/arabic-ocr), re-expressed Spark-first.

Layout
------
kernel/     pure-NumPy per-payload extraction kernel (no Spark, no cv2)
sources/    payload codec, synthetic fixture/table generators
operators/  DataFrame-level training-data pipeline operators (dedup,
            similarity search, text analysis)
streaming/  Structured Streaming variant of the extraction job
job.py      the batch extraction job: scan -> prune -> salted repartition ->
            sortWithinPartitions -> mapInPandas(kernel) -> checkpointed write
            + per-partition lineage
training.py distributed training job producing the classifier model artifact
"""

__version__ = "0.1.0"
