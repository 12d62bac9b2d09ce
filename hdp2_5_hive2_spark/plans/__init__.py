"""Physical-plan helpers beyond what AQE does automatically.

SURVEY.md §4's conclusion: every Hive optimization except two is already in
Catalyst/AQE. The custom budget goes here — explicit skew salting for the
cases AQE's runtime split can't fix (single hot key in an aggregation;
non-splittable build sides), mirroring what Hive's SkewJoinOptimizer /
GenMRSkewJoinProcessor did at compile time (ql/optimizer/SkewJoinOptimizer.java,
ql/exec/SkewJoinHandler.java:74 in /root/reference).
"""

from hdp2_5_hive2_spark.plans.broadcast_hints import (
    hinted,
    register_table_size,
    registered_size,
)
from hdp2_5_hive2_spark.plans.salting import salted_aggregate, salted_join

__all__ = [
    "hinted",
    "register_table_size",
    "registered_size",
    "salted_aggregate",
    "salted_join",
]
