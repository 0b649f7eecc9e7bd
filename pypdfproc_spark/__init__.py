"""pypdfproc_spark — a PySpark-native, from-scratch re-implementation of the
extraction capabilities of cmlburnett/pypdfproc (reference, read-only at
/root/reference), designed for 100 TB-scale Common-Crawl-style corpora.

Layout:
- ``core``   — pure-Python per-document parsing (no Spark imports): COS object
  model, stream filters, content-stream interpretation, font/Unicode
  resolution, text assembly, HTML boilerplate strip.  Everything here runs
  inside vectorized pandas/Arrow UDF batches on executors.
- ``spark``  — the DataFrame-level pipeline: routing, url-hash partitioning
  with salting, extraction UDFs, dedup/metrics/checkpoint-resume, and the
  training-data operators (dedup families, similarity search, text stats).
"""

__version__ = "0.1.0"
