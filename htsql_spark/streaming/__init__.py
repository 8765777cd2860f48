from .events import (  # noqa: F401
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    running_totals_per_user,
    session_counts,
    sliding_event_avg,
    tumbling_counts,
)
