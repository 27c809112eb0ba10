"""covsar_spark — a PySpark-native time-series rollup + downsample + retention engine.

Re-expresses the query/data-processing capabilities of rbiessel/CovSAR
(a single-process NumPy InSAR covariance/phase-linking pipeline; see SURVEY.md)
as an idiomatic Spark DataFrame engine over pre-tokenized training-sequence
tables ``(doc_id string, tokens array<int32>, n_tok int32, source string)``:

- continuous aggregates (tumbling-window rollups at 1m/1h/1d retention tiers)
- gap-fill of missing acquisition epochs (zero / forward / linear policies)
- per-(source, window) lag-covariance Gram matrices + dominant-eigenvector
  extraction (CovSAR "phase linking", covsar/library.py:113-146) as a batched
  ``applyInPandas`` kernel over ``numpy.linalg.eigh``
- Gorilla XOR value compression + delta-of-delta timestamp compression as
  vectorized numpy pandas UDFs
- checkpoint/resume manifests with per-partition lineage + metrics
- training-data pipeline extras: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), ANN similarity search, text quality analysis, multimodal
  binary-column plumbing.

All heavy computation stays JVM-side (built-in pyspark.sql.functions) or in
Arrow-vectorized pandas UDFs; no per-row Python anywhere in the hot path.
"""

__version__ = "0.1.0"
