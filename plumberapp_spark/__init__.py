"""plumberapp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mkuchnik/PlumberApp (MLSys '22).

The reference is a tf.data-pipeline diagnosis/rewrite tool; this package
re-expresses its three surfaces Spark-first:

* data-processing surface  -> ``plumberapp_spark.operators`` / ``sources`` /
  ``functions`` (DataFrame combinators; Catalyst owns physical planning)
* query surface            -> ``plumberapp_spark.metrics`` (the per-operator
  stats model as a DataFrame) + ``plumberapp_spark.queries`` (the analytic
  query library, each with a DuckDB-checkable oracle)
* rewrite/optimizer surface-> ``plumberapp_spark.plans`` (a plain-Python plan
  IR) + ``plumberapp_spark.optimizer`` (LP/advice over the metrics model)

Beyond the reference surface, ``plumberapp_spark.llm`` adds the
large-scale-training-data operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB inputs.
"""

from plumberapp_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
