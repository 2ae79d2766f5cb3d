"""Training-data pipeline operators (dedup, similarity, text, multimodal).

These extend the crawl engine with the set-at-a-time operations a
large-scale (100 TB) training-data pipeline needs over crawled corpora:
exact + near deduplication, embedding similarity search, text quality
analysis, and multimodal (binary image column) plumbing.

Design rule shared by every module here: each operator has ONE
definition in portable arithmetic (md5-derived 32-bit hashes, integer
basis points, floor-quantized floats) so the PySpark implementation and
the DuckDB oracle SQL in :mod:`pyspider_spark.queries` compute
byte-identical values — float accumulation order never leaks into an
output column.
"""
