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

# Public API — the stable surface a reference user would script against.
from stackai_vector_db_spark.session import get_spark  # noqa: E402,F401
from stackai_vector_db_spark.catalog import load_table, load_tables  # noqa: E402,F401
from stackai_vector_db_spark.functions.vector import (  # noqa: E402,F401
    cosine_distance,
    enforce_dim_consistency,
    euclidean_distance,
    fake_embedding,
)
from stackai_vector_db_spark.operators.knn import brute_force_topk  # noqa: E402,F401
from stackai_vector_db_spark.operators.ivf import (  # noqa: E402,F401
    assign_clusters,
    ivf_search,
    kmeans_centroids,
    knn_join,
    write_ivf_layout,
)
from stackai_vector_db_spark.operators.ann_lsh import ann_lsh_topk  # noqa: E402,F401
from stackai_vector_db_spark.operators.asof import asof_join_backward  # noqa: E402,F401
from stackai_vector_db_spark.operators.range_join import banded_range_join  # noqa: E402,F401
from stackai_vector_db_spark.operators.dedup import (  # noqa: E402,F401
    build_minhash_index,
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from stackai_vector_db_spark.plans.store import VectorStore  # noqa: E402,F401
