from .events import (  # noqa: F401
    dedup_within_watermark,
    enrich_with_dim,
    purchases_enriched,
    purchases_join_clicks_stream,
    read_events_stream,
    run_foreach_batch,
    run_to_memory,
    run_to_parquet,
    running_totals_per_user,
    session_counts,
    sliding_event_avg,
    tumbling_counts,
    windowed_distinct_users,
)
from .curate import (  # noqa: F401
    curate_stream,
    read_documents_stream,
    run_dedup_ingest,
    run_exact_dedup_ingest,
)
from .snapshot import (  # noqa: F401
    apply_cdc_batch,
    run_cdc_snapshot,
)
