"""Storage layer: writes, formats, bucketing, statistics.

Parity targets (SURVEY.md §2.1, §4.2): FileSinkOperator
(ql/exec/FileSinkOperator.java:92 in /root/reference — dynamic partitioning,
bucketing, compression), the merge-files operators
(ql/exec/AbstractFileMergeOperator.java), the storage-format surface
(ORC/Parquet/Text/JSON descriptors under ql/io/), and ANALYZE TABLE stats
(ql/optimizer/StatsOptimizer.java:97 consumes them).
"""

from hdp2_5_hive2_spark.storage.avro import read_avro, write_avro
from hdp2_5_hive2_spark.storage.rcfile import read_rcfile, write_rcfile
from hdp2_5_hive2_spark.storage.writer import (
    analyze_table,
    drop_table,
    compact_files,
    insert_into,
    multi_insert,
    insert_overwrite,
    read_sequencefile,
    read_regex_serde,
    read_textfile,
    write_bucketed_table,
    write_partitioned,
    write_sequencefile,
    write_textfile,
    drop_partition,
)

__all__ = [
    "analyze_table",
    "drop_table",
    "compact_files",
    "insert_into",
    "multi_insert",
    "insert_overwrite",
    "read_sequencefile",
    "read_regex_serde",
    "read_textfile",
    "write_bucketed_table",
    "write_partitioned",
    "write_sequencefile",
    "write_textfile",
    "drop_partition",
    "read_rcfile",
    "write_rcfile",
    "read_avro",
    "write_avro",
]
