"""stackai_vector_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference vector database
(GranGatsby/stackai-vector-db), re-expressed Spark-first.

The reference is a single-process in-memory vector DB (Library → Document →
Chunk hierarchy, kNN search over per-library indexes). Here the unit of work
is a DataFrame query over columnar Parquet tables; index *build* is a batch
job; kNN *search* is scan/prune + distance + top-k. See SURVEY.md for the
full operator inventory and the reference file:line citations carried in each
module's docstrings.
"""

__version__ = "0.1.0"
