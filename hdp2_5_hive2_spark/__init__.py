"""PySpark-native analytics engine with the query surface of Apache Hive 2.1.0
(reference: OpenPOWER-BigData/HDP2.5-Hive2, surveyed in SURVEY.md).

Architecture: a thin Python library over Spark SQL / Catalyst. Hive's parse →
analyze → optimize → execute pipeline (SURVEY.md §3) is Catalyst's job; this
package supplies the session/catalog/API layer, the Hive function-name shims,
the query corpus that proves operator parity, and the LLM-data-pipeline
operators (dedup / similarity / text analysis / multimodal) designed for
100 TB scale.
"""

from hdp2_5_hive2_spark.session import get_session
from hdp2_5_hive2_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_session", "load_tables", "register_views", "TABLES"]

__version__ = "0.1.0"
