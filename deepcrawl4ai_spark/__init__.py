"""deepcrawl4ai_spark — a PySpark-native rebuild of the deepcrawl4ai crawl engine.

A from-scratch URL-frontier + fetch scheduler over checkpointed (Iceberg-style)
tables of interleaved text+media span documents, plus the training-data operator
library (dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB pipeline needs.

Reference behavior spec: /root/reference (deepscrape/deepcrawl4ai); see SURVEY.md.
This package is idiomatic Spark: DataFrame/SQL plans, Catalyst-friendly
expressions, vectorized pandas/Arrow UDFs only where built-ins can't express the
semantics (URL parsing, bloom-filter bit arrays, the fetch stage).
"""

__version__ = "0.1.0"
