from jaccard_mapreduce_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    stateful_user_counts,
)
from jaccard_mapreduce_spark.streaming.incremental import IncrementalJaccard  # noqa: F401
