"""Query corpus proving operator parity with the reference (SURVEY.md §2).

Every module in this package registers named queries via
`hdp2_5_hive2_spark.queries.registry.query`. Importing this package loads
the full corpus; `REGISTRY` then maps name → QuerySpec.
"""

from hdp2_5_hive2_spark.queries.registry import REGISTRY, QuerySpec, query

# Corpus modules — import order irrelevant; each registers into REGISTRY.
from hdp2_5_hive2_spark.queries import tpch  # noqa: F401  (scan/filter/agg/join/sort)
from hdp2_5_hive2_spark.queries import relational  # noqa: F401  (joins/setops/subqueries/grouping)
from hdp2_5_hive2_spark.queries import window  # noqa: F401  (windowing/PTF parity)
from hdp2_5_hive2_spark.queries import functions_corpus  # noqa: F401  (scalar function surface)
from hdp2_5_hive2_spark.queries import llm_corpus  # noqa: F401  (dedup/similarity/text)
from hdp2_5_hive2_spark.queries import streaming_corpus  # noqa: F401  (event-time windows)
from hdp2_5_hive2_spark.queries import storage_corpus  # noqa: F401  (write-path round trips)
from hdp2_5_hive2_spark.queries import hive_surface  # noqa: F401  (TRANSFORM/LATERAL VIEW/PTF)
from hdp2_5_hive2_spark.queries import retrieval_corpus  # noqa: F401  (tfidf/bm25/stats parity)
from hdp2_5_hive2_spark.queries import pipeline_corpus  # noqa: F401  (r9 pipeline frontier)
from hdp2_5_hive2_spark.queries import pipeline2_corpus  # noqa: F401  (r10 curation planning)
from hdp2_5_hive2_spark.queries import pipeline3_corpus  # noqa: F401  (r11 graph/index health)
from hdp2_5_hive2_spark.queries import pipeline4_corpus  # noqa: F401  (r12 sampling/serving ablations)
from hdp2_5_hive2_spark.queries import pipeline5_corpus  # noqa: F401  (r13 arrival/mixture audits)

__all__ = ["REGISTRY", "QuerySpec", "query"]
