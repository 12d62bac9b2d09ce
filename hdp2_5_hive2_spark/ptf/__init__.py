"""Partitioned table functions (PTF) beyond windowing.

Parity target: Hive's PTFOperator (ql/exec/PTFOperator.java:46 in
/root/reference) with the MatchPath table function
(ql/udf/ptf/MatchPath.java, 938 LoC) — regex-like row-sequence pattern
matching over a partitioned, ordered stream (the precursor of SQL
MATCH_RECOGNIZE). Window functions themselves map to Spark's Window API
(queries/window.py); this package holds the PTFs Spark lacks.
"""

from hdp2_5_hive2_spark.ptf.matchpath import match_path, match_path_result, symbol_attr

__all__ = ["match_path", "match_path_result", "symbol_attr"]


def noop(df):
    """Noop PTF (ql/udf/ptf/Noop.java — test scaffolding in the reference):
    identity over the partitioned input."""
    return df


def noopwithmap(df):
    """NoopWithMap PTF (ql/udf/ptf/NoopWithMap.java): identity with a
    map-side pass — under Spark both collapse to the same plan."""
    return df
