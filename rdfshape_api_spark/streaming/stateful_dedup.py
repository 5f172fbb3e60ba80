"""Custom stateful streaming operator: cross-batch exact dedup.

A training-data ingest stream must not re-emit documents already seen in
earlier micro-batches — a classic custom stateful operator
(``applyInPandasWithState``: Arrow-batched state per key, the Structured
Streaming analogue of the reference's per-item dedup-free pipeline plus
this engine's batch ``exact_duplicates``).

Keyed by content fingerprint; state = "seen" marker + first-seen count.
Emits each distinct fingerprint's FIRST occurrence only, with the
occurrence count so far for observability.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "fp string, doc_sha256 string, n_seen bigint"
STATE_SCHEMA = "seen bigint"


def _dedup_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    seen = state.get[0] if state.exists else 0
    first_sha = None
    n = 0
    for pdf in batches:
        n += len(pdf)
        if len(pdf):
            # deterministic representative WITHIN a trigger: min sha (Arrow
            # batch order is not stable, min is) — across triggers the
            # first-arriving trigger still wins (stream-order semantics)
            m = pdf["doc_sha256"].min()
            first_sha = m if first_sha is None else min(first_sha, m)
    total = seen + n
    state.update((total,))
    if seen == 0 and n > 0:
        # first time this fingerprint appears across the whole stream
        yield pd.DataFrame({"fp": [fp], "doc_sha256": [first_sha], "n_seen": [n]})


def stream_dedup_first_seen(stream_df: DataFrame) -> DataFrame:
    """streaming docs → first occurrence per fingerprint (exactly once
    across all micro-batches; later duplicates update state silently).

    Input needs columns ``fp`` (grouping key) and ``doc_sha256``.
    """
    return stream_df.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
