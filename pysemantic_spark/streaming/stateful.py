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

import numpy as np
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
        outs: list[pd.DataFrame] = []
        for pdf in pdfs:
            # Vectorized replay of the sequential rule over the SORTED batch
            # (no per-row Python — a 10^5-turn replay batch is a handful of
            # numpy ops). For sorted a, the sequential "expected = running
            # max + 1" state at element i is prefix_max_i =
            # max(carried max_seen, a[i-1]) (a is sorted, so the running max
            # of earlier elements is just the previous element). Then
            #   duplicate: a[i] <= prefix_max_i       (idx already seen)
            #   gap:       a[i] >  prefix_max_i + 1   (skipped ahead; resync)
            #   ok:        a[i] == prefix_max_i + 1
            # which reproduces the per-row loop exactly, including
            # gap-resync (the running max jumps to a[i] either way).
            a = np.sort(pdf["turn_idx"].dropna().to_numpy(dtype=np.int64))
            if a.size == 0:
                continue
            prefix_max = np.empty_like(a)
            prefix_max[0] = max_seen
            np.maximum(a[:-1], max_seen, out=prefix_max[1:])
            expected = prefix_max + 1
            dup = a <= prefix_max
            bad = dup | (a > expected)
            if bad.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "conv_id": conv_id,
                            "turn_idx": a[bad].astype(np.int32),
                            "expected_next": expected[bad].astype(np.int32),
                            "kind": np.where(dup[bad], "duplicate", "gap"),
                        }
                    )
                )
            max_seen = int(max(max_seen, a[-1]))
        state.update((max_seen,))
        if evict_idle_ms > 0:
            state.setTimeoutDuration(evict_idle_ms)
        if outs:
            yield pd.concat(outs, ignore_index=True)

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
