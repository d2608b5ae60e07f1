"""Streaming near-duplicate detection: MinHash LSH with bounded state.

The batch pipeline (dedup/minhash.py) banded-buckets signatures, then
verifies candidates with an exact shingle join — a shape that needs
the whole corpus. The streaming form detects, as documents ARRIVE,
which earlier document (within a time horizon) they near-duplicate:

- stateless prefix: shingle -> MinHash signature -> explode one row
  per LSH band, keyed by the band's bucket hash (reusing the batch
  module's exact column expressions, so batch and stream agree
  bit-for-bit on bucketing);
- one stateful operator (``applyInPandasWithState`` keyed by bucket):
  state is the bucket's recent members — (id, event-time ms, packed
  signature) — bounded three ways: the horizon evicts members the
  watermark has passed, an event-time timeout clears idle buckets
  entirely, and ``max_bucket`` FIFO-caps degenerate buckets (the same
  cap contract as the batch ``_candidate_pairs``);
- every arriving document is scored against the bucket's members by
  signature agreement (mean of equal MinHash slots — the unbiased
  Jaccard estimator); pairs at or above ``threshold`` are emitted with
  ``id_a`` = the earlier-arrived document.

A pair that collides in several bands is emitted once per band (the
buckets cannot see each other by design); consumers dedupe on
(id_a, id_b) — exactly-once pair identity would need a second stateful
operator, and multiplicity <= n_bands is harmless for the dedup
use-case. State is O(documents per horizon per bucket), independent of
history length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from linkgraph.dedup.minhash import minhash_signatures, shingle_sets

OUTPUT_SCHEMA = "id_a long, id_b long, est_jaccard double, ts timestamp"
STATE_SCHEMA = "ids array<long>, ts_ms array<long>, sigs array<binary>"


def _bucket_fold(n_hashes: int, threshold: float, horizon_ms: int, max_bucket: int):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # No member has arrived for a full horizon: every survivor
            # is un-matchable by any future arrival. Drop the bucket.
            state.remove()
            return
        ids: list[int]
        ts_ms: list[int]
        sigs: list[np.ndarray]
        if state.exists:
            s_ids, s_ts, s_sigs = state.get
            ids = list(s_ids)
            ts_ms = list(s_ts)
            sigs = [np.frombuffer(b, dtype=np.int64) for b in s_sigs]
        else:
            ids, ts_ms, sigs = [], [], []

        # Horizon eviction: a member the watermark has passed by more
        # than the horizon can never pair with a live arrival.
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and ids:
            keep = [i for i, t in enumerate(ts_ms) if t + horizon_ms >= wm]
            if len(keep) < len(ids):
                ids = [ids[i] for i in keep]
                ts_ms = [ts_ms[i] for i in keep]
                sigs = [sigs[i] for i in keep]

        chunks = [p for p in pdfs if not p.empty]
        rows: list[tuple[int, int, float, int]] = []
        if chunks:
            batch = pd.concat(chunks)
            b_ids = batch["id"].to_numpy()
            b_ts = batch["ts"].astype("int64").to_numpy() // 1_000_000  # ns -> ms
            b_sigs = batch["sig"].to_numpy()
            for i in np.lexsort((b_ids, b_ts)):  # event-time arrival order
                nid, nts = int(b_ids[i]), int(b_ts[i])
                nsig = np.asarray(b_sigs[i], dtype=np.int64)
                for mid, mts, msig in zip(ids, ts_ms, sigs):
                    if nts - mts > horizon_ms or mid == nid:
                        continue
                    est = float((msig == nsig).mean())
                    if est >= threshold:
                        rows.append((mid, nid, est, nts))
                ids.append(nid)
                ts_ms.append(nts)
                sigs.append(nsig)
                if len(ids) > max_bucket:  # FIFO cap on degenerate buckets
                    ids, ts_ms, sigs = (
                        ids[-max_bucket:], ts_ms[-max_bucket:], sigs[-max_bucket:]
                    )
        if ids:
            state.update(
                (ids, ts_ms, [s.tobytes() for s in sigs])
            )
            state.setTimeoutTimestamp(max(ts_ms) + horizon_ms)
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(
                {
                    "id_a": [a for a, _, _, _ in rows],
                    "id_b": [b for _, b, _, _ in rows],
                    "est_jaccard": [e for _, _, e, _ in rows],
                    "ts": [pd.Timestamp(t, unit="ms") for _, _, _, t in rows],
                }
            )

    return fold


def band_keys(
    signed: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """Explode (id, ts, sig) to one row per band with the SAME bucket
    hash the batch pipeline uses (xxhash64 over (band, sig slice))."""
    bands = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band))
            for b in range(n_bands)
        ]
    )
    return signed.select(
        "id", "ts", "sig", F.explode(bands).alias("band")
    )


def streaming_minhash_pairs(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.7,
    horizon_minutes: int = 60,
    watermark_minutes: int | None = None,
    max_bucket: int = 256,
) -> DataFrame:
    """(id_a, id_b, est_jaccard, ts): near-duplicate pairs detected at
    arrival time, append-mode. ``id_a`` arrived earlier; ``ts`` is the
    later document's event time; ``est_jaccard`` is the MinHash
    signature agreement (k = ``n_hashes`` slots). Pairs may repeat
    across bands (see module docstring).
    """
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    wm_min = horizon_minutes if watermark_minutes is None else watermark_minutes
    signed = minhash_signatures(
        shingle_sets(docs, text_col, id_col, shingle, carry=(ts_col,)),
        n_hashes,
    ).withColumnRenamed(ts_col, "ts")
    return (
        band_keys(signed, n_bands, r)
        .withWatermark("ts", f"{wm_min} minutes")
        .groupBy("band")
        .applyInPandasWithState(
            _bucket_fold(n_hashes, threshold, horizon_minutes * 60_000, max_bucket),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
