from hdp2_5_hive2_spark.streaming.corpus import (
    resolve_dup_verdicts,
    streaming_burstiness_monitor,
    streaming_session_gap_monitor,
    streaming_compaction_monitor,
    streaming_interleave_scheduler,
    resolve_image_verdicts,
    streaming_image_dedup,
    streaming_minhash_dedup,
)
from hdp2_5_hive2_spark.streaming.events import (
    sessionize_batch,
    sliding_counts_batch,
    stream_events,
    streaming_tumbling_counts,
    tumbling_counts_batch,
)

__all__ = [
    "stream_events",
    "streaming_tumbling_counts",
    "tumbling_counts_batch",
    "sliding_counts_batch",
    "sessionize_batch",
    "streaming_minhash_dedup",
    "resolve_dup_verdicts",
    "streaming_image_dedup",
    "streaming_burstiness_monitor",
    "streaming_session_gap_monitor",
    "streaming_compaction_monitor",
    "streaming_interleave_scheduler",
    "resolve_image_verdicts",
]
