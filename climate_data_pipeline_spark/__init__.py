"""climate_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference climate-data pipeline (vulcan2018/climate-data-pipeline):
ingest → layout-tuned columnar storage → lazy declarative query plans →
pre-computed climate metrics (temporal means, climatologies, percentiles,
trends, anomalies) — plus the large-scale training-data operators a
100 TB pipeline needs (dedup, similarity search, text analysis).

Architecture: DataFrame / Spark SQL everywhere; Catalyst does pushdown,
pruning and join planning; Pandas UDFs (`applyInPandas`) only where the
semantics are genuinely non-relational (Mann-Kendall / Sen's slope).

Layout (mirrors SURVEY.md §7.1):

- ``sources``   — parquet loaders, write-layout presets, catalog/info
- ``operators`` — temporal, percentiles, trends, anomalies, stats,
                  relational, dedup, similarity, text, multimodal
- ``functions`` — scalar helpers (season keys, classification bands, hashes)
- ``plans``     — op-dict DSL → DataFrame compiler, Pipeline runner
- ``streaming`` — Structured Streaming analogues (tumbling-window rollup)
"""

__version__ = "0.1.0"
