"""Structured-Streaming surface (SURVEY.md §2.8/§7 M6).

The reference is batch-only; this package is the north-star streaming
extension over the driver's ``events`` table. Design rule: every
transformation here is written against a plain DataFrame, so the SAME
function serves batch and stream — batch-equivalence is the test
contract (tests/test_streaming.py).
"""

from .ops import (  # noqa: F401
    dedup_events,
    session_agg,
    sliding_counts,
    tumbling_counts,
    with_watermark,
)
from .replay import (  # noqa: F401
    replay_as_stream,
    run_idempotent_batch_sink,
    run_to_memory_sink,
)
from .stateful import running_totals  # noqa: F401
