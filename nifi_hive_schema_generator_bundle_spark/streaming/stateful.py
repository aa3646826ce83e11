"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY §2 — micro-batching
is inherited from the NiFi scheduler); these are north-star extensions
built on Structured Streaming's keyed-state API.

Scale notes: state lives in the state store partitioned by the group key,
so memory is bounded per key, not per stream; an opt-in processing-time
timeout evicts idle keys. Fingerprints are stored as a hash (md5 hex),
never document bodies.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.textfns import normalize_ws

__all__ = ["streaming_first_occurrence", "FIRST_OCCURRENCE_SCHEMA"]

FIRST_OCCURRENCE_SCHEMA = StructType(
    [
        StructField("bucket", LongType(), False),
        StructField("doc_id", LongType(), True),
        StructField("fp", StringType(), True),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()), True)])


def _make_dedup_group(idle_timeout_ms: int | None):
    def _dedup_group(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # evict idle bucket's fingerprint set
            yield pd.DataFrame({"bucket": [], "doc_id": [], "fp": []})
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        out_ids: list[int] = []
        out_fps: list[str] = []
        for pdf in pdfs:
            for doc_id, fp in zip(pdf["doc_id"], pdf["fp"]):
                if fp not in seen:
                    seen.add(fp)
                    out_ids.append(int(doc_id))
                    out_fps.append(fp)
        state.update((sorted(seen),))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"bucket": [key[0]] * len(out_ids), "doc_id": out_ids, "fp": out_fps}
        )

    return _dedup_group


def streaming_first_occurrence(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming exact-dedup: emit each document the first time its
    normalized-text fingerprint appears anywhere in the stream; suppress
    all later copies across micro-batches.

    The fingerprint (md5 of whitespace-normalized lowercased text) is
    computed ONCE, JVM-side, and both the state bucket and the dedup key
    derive from it — a single normalization source of truth, so
    fp-equal documents can never land in different buckets. Buckets
    hash-partition the fingerprint space into ``n_buckets`` state groups
    so state distributes across executors.

    Not expressible as SQL over a batch table — the driver gate records a
    rows-only check for the batch-mode harness of this operator.

    ``idle_timeout_ms`` (continuous deployments only): evict a bucket's
    fingerprint state after that much processing-time idleness. Leave
    ``None`` for run-to-completion triggers — a pending processing-time
    timeout keeps an ``availableNow`` query from ever terminating.
    """
    fp = F.md5(normalize_ws(F.lower(F.col(text_col))))
    keyed = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        fp.alias("fp"),
        F.pmod(F.xxhash64(fp), F.lit(n_buckets)).alias("bucket"),
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_dedup_group(idle_timeout_ms),
        outputStructType=FIRST_OCCURRENCE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
