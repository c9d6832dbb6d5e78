"""Custom stateful streaming operators via ``applyInPandasWithState``.

``streaming_seen_filter`` is the streaming half of exact dedup: an
exactly-once "first sighting wins" filter over an unbounded stream, keyed by
content hash. Batch dedup (operators/dedup.py) answers "which of these rows
are duplicates of each other"; this answers "is this arriving row a duplicate
of ANYTHING seen so far" without re-scanning history — per-key state holds
one row (first_seen ts + count), the GroupState machinery shards it across
executors, and a processing-time timeout (optional) bounds state size for
keys that stop arriving.

``streaming_conversation_state`` keeps a running per-conversation record
(turn count, last role, concatenated text length) — the stateful analogue of
the batch ``build_entity_records`` fold, for pipelines that need live
conversation state rather than per-micro-batch recomputation.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_OUTPUT_DDL = "h long, doc_id long, is_first boolean, n_seen long"
SEEN_STATE_DDL = "n_seen long, first_doc long"

CONV_OUTPUT_DDL = (
    "conv_id string, n_turns long, last_role string, text_chars long"
)
CONV_STATE_DDL = "n_turns long, last_role string, text_chars long"


def _make_seen_fn(ttl_ms: int | None):
    """Closure factory: cloudpickle ships the closure BY VALUE, so the TTL
    reaches the executors (a module global mutated on the driver would not —
    workers re-import the module and see the definition-time value)."""

    def _seen_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (h,) = key
        # Timed-out invocation: the key went idle past its TTL — drop the
        # state (a later re-arrival of the hash is reported as first again;
        # bounded state is the contract, exact-forever dedup is the batch
        # operator's job).
        if state.hasTimedOut:
            state.remove()
            return
        n_seen, first_doc = state.get if state.exists else (0, None)
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            ids = pdf["doc_id"].to_numpy()
            firsts = []
            for d in ids:
                if n_seen == 0:
                    first_doc = int(d)
                    firsts.append(True)
                else:
                    firsts.append(False)
                n_seen += 1
            outs.append(
                pd.DataFrame(
                    {
                        "h": h,
                        "doc_id": ids,
                        "is_first": firsts,
                        "n_seen": range(n_seen - len(ids) + 1, n_seen + 1),
                    }
                )
            )
        state.update((n_seen, first_doc))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield from outs

    return _seen_fn


def streaming_seen_filter(
    turns: DataFrame, hash_col: str = "h", state_ttl_ms: int | None = None
) -> DataFrame:
    """stream(h, doc_id) -> (h, doc_id, is_first, n_seen): exactly one row per
    input with is_first=True only on a hash's first-ever sighting.

    ``state_ttl_ms`` bounds state on an unbounded keyspace: keys idle longer
    than the TTL are evicted (processing-time timeout), so per-key state no
    longer grows forever on a 100-TB stream. A hash re-arriving after
    eviction counts as first again — the explicit trade of bounded state for
    exactness beyond the TTL horizon. Default None keeps exact-forever
    semantics (NoTimeout).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return turns.groupBy(hash_col).applyInPandasWithState(
        _make_seen_fn(state_ttl_ms),
        outputStructType=SEEN_OUTPUT_DDL,
        stateStructType=SEEN_STATE_DDL,
        outputMode="append",
        timeoutConf=timeout,
    )


def _conv_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    n_turns, last_role, text_chars = (
        state.get if state.exists else (0, None, 0)
    )
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        n_turns += len(pdf)
        if len(pdf):
            last_role = str(pdf["role"].iloc[-1])
        text_chars += int(pdf["text"].str.len().fillna(0).sum())
    state.update((n_turns, last_role, text_chars))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "last_role": [last_role],
            "text_chars": [text_chars],
        }
    )


def streaming_conversation_state(turns: DataFrame) -> DataFrame:
    """stream of turns -> one updated (conv_id, n_turns, last_role,
    text_chars) row per conversation per micro-batch (update semantics)."""
    return turns.groupBy("conv_id").applyInPandasWithState(
        _conv_fn,
        outputStructType=CONV_OUTPUT_DDL,
        stateStructType=CONV_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
