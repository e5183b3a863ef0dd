"""Custom stateful streaming operator: per-conversation turn-contiguity
validation via ``applyInPandasWithState``.

Batch checks see the whole conversation at once; a stream sees turns
arrive over many micro-batches, so "is turn_idx contiguous?" needs per-key
state: the highest turn index seen so far. GroupState holds exactly one
integer per conversation — O(#active conversations) memory, with a
processing-time timeout so abandoned conversations age out of the store.

Emits one row per *violation observed at arrival time*:
- kind='gap'        turn arrived with idx > expected next
- kind='duplicate'  turn idx ≤ max already seen (replay / duplicate)
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, expected_next int, kind string"
)
STATE_SCHEMA = "max_seen int"


def _make_check_contiguity(evict_idle_ms: int):
    """Factory, not a module global: the state function is pickled to the
    Python workers, so config must travel inside its closure — a driver-side
    global would silently reset to its default on executors."""

    def _check_contiguity(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        max_seen = state.get[0] if state.exists else -1
        out_rows = []
        for pdf in pdfs:
            for idx in sorted(int(i) for i in pdf["turn_idx"].dropna()):
                expected = max_seen + 1
                if idx == expected:
                    max_seen = idx
                elif idx > expected:
                    out_rows.append((conv_id, idx, expected, "gap"))
                    max_seen = idx  # resync so one gap isn't re-reported forever
                else:
                    out_rows.append((conv_id, idx, expected, "duplicate"))
        state.update((max_seen,))
        if evict_idle_ms > 0:
            state.setTimeoutDuration(evict_idle_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["conv_id", "turn_idx", "expected_next", "kind"]
            )

    return _check_contiguity


def turn_contiguity_stream(
    stream_df: DataFrame, evict_idle_ms: int = 0
) -> DataFrame:
    """Streaming DF (conv_id, turn_idx, …) → violation stream.

    Arrow-batched per group; state is one int per conversation.

    ``evict_idle_ms`` > 0 enables ProcessingTimeTimeout eviction of idle
    conversations — use it on long-running production streams. Default off:
    with a processing-time timeout the engine triggers empty state-cleanup
    batches forever, so ``processAllAvailable()`` (tests, drain-and-stop
    jobs) never returns."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream_df.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_check_contiguity(evict_idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
