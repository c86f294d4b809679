"""PySpark-native rebuild of UNIMIBInside/bigtwine-streamprocessor.

A Twitter NEEL (Named Entity rEcognition and Linking) stream/batch engine
re-expressed Spark-first: DataFrame/Column ops for every row transform, a
stateful ``applyInPandasWithState`` fan-in for the per-tweet correlation, and
``foreachBatch`` for the external enrichment RPC hops — plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) layered on the same engine.

Reference semantics are cited per-operator as ``file:line`` into the read-only
reference checkout (Flink 1.8.1, Java), e.g. ``TwitterStreamJob.java:211-225``.
No code is copied from the reference; it is a behavioral spec only.
"""

__version__ = "0.1.0"
