"""Pure-NumPy extraction kernel.

Everything in this package is Spark-free and cv2-free: plain functions over
uint8 arrays, so the same code runs as the serial oracle in tests and inside
the `mapInPandas` kernel on executors (shipped via --py-files).
"""
