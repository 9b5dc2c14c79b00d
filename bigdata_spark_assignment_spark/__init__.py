"""bigdata_spark_assignment_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference repo ``vcuende/BigData-Spark-Assignment`` (a Scala Spark 3.3.1
flight-delay cleaning + regression script, ``src/main/scala/Main.scala``),
re-expressed Spark-first:

* relational core — scans, projection, filters, joins, aggregation
  (reference ``Main.scala:94-389``);
* cleaning / feature ops — NA→null, null→"unknown", hhmm day-part
  bucketing, constant-column prune, mean/mode imputation
  (reference ``Main.scala:13-38, 168-316``);
* ML pipeline parity — indexer → OHE → assembler → L1 normalizer →
  univariate selection → {LR, DTR, RF} × 5-fold CV
  (reference ``Main.scala:336-666``);
* north-star extensions with no reference precedent: dedup (exact,
  MinHash-LSH, SimHash), similarity search over embeddings, text
  analysis, multimodal binary columns, Structured Streaming.

Everything is DataFrame/SQL-level so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
