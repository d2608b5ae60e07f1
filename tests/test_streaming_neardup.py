"""Streaming MinHash near-dup vs a batch replay of the same bucketing:
pair-set parity within one horizon, plus horizon eviction across
far-apart slices."""

from __future__ import annotations

import time
from datetime import datetime, timezone

import numpy as np
from pyspark.sql import functions as F

from linkgraph.dedup.minhash import minhash_signatures, shingle_sets
from linkgraph.streaming.jobs import run_available_now
from linkgraph.streaming.neardup import band_keys, streaming_minhash_pairs

BASE_MIN = 1440.0
SCHEMA = "doc_id long, ingest_ts timestamp, text string"


def _ts(minutes: float):
    return datetime.fromtimestamp((BASE_MIN + minutes) * 60, tz=timezone.utc).replace(
        tzinfo=None
    )


def _docs(base_id, minute0, texts):
    return [(base_id + i, _ts(minute0 + i), t) for i, t in enumerate(texts)]


_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _corpus(seed, n, mutate_every):
    """n docs: near-identical except one word swapped every
    ``mutate_every``-th doc; distinct docs otherwise."""
    import random

    rng = random.Random(seed)
    base = " ".join(_WORDS)
    out = []
    for i in range(n):
        if i % mutate_every == 0:
            words = list(_WORDS)
            words[rng.randrange(len(words))] = f"w{i}"
            out.append(" ".join(words))
        else:
            out.append(" ".join(rng.sample(_WORDS, 8)) + f" unique{i}")
    return out


def _batch_replay(spark, rows, n_hashes=32, n_bands=8, threshold=0.7):
    """The stream's contract in batch: same signatures, same band
    hashes, pairs within a bucket in (ts, id) arrival order scored by
    signature agreement."""
    df = spark.createDataFrame(rows, SCHEMA)
    signed = minhash_signatures(
        shingle_sets(df, "text", "doc_id", 3, carry=("ingest_ts",)), n_hashes
    ).withColumnRenamed("ingest_ts", "ts")
    banded = band_keys(signed, n_bands, n_hashes // n_bands).collect()
    buckets: dict[int, list] = {}
    for r in banded:
        buckets.setdefault(r["band"], []).append(
            (r["ts"], r["id"], np.asarray(r["sig"], dtype=np.int64))
        )
    pairs = {}
    for members in buckets.values():
        members.sort(key=lambda m: (m[0], m[1]))
        for j in range(len(members)):
            for i in range(j):
                est = float((members[i][2] == members[j][2]).mean())
                if est >= threshold:
                    pairs[(members[i][1], members[j][1])] = est
    return pairs


def test_streaming_pairs_match_batch_replay(spark, tmp_path):
    texts = _corpus(5, 40, mutate_every=4)
    rows = _docs(0, 0.0, texts)  # all within one horizon
    path = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)

    stream = spark.readStream.schema(SCHEMA).parquet(path)
    out = streaming_minhash_pairs(stream, horizon_minutes=120)
    run_available_now(out, "neardup_sink", str(tmp_path / "ck"), output_mode="append")
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in spark.table("neardup_sink").collect()
    }
    want = _batch_replay(spark, rows)
    assert want, "fixture must produce near-dup pairs"
    assert got == want
    # id_a always arrived earlier (ids here are in arrival order)
    assert all(a < b for a, b in got)


def test_horizon_eviction_across_slices(spark, tmp_path):
    dup = " ".join(_WORDS)
    slice_a = _docs(0, 0.0, [dup, dup + " x"])          # near-dup pair in A
    slice_b = _docs(100, 600.0, ["far future watermark push only"])
    slice_c = _docs(200, 1200.0, [dup, dup + " y"])     # near-dup pair in C

    path = str(tmp_path / "docs_in")
    for rows in (slice_a, slice_b, slice_c):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = streaming_minhash_pairs(stream, horizon_minutes=60)
    run_available_now(out, "neardup_ev", str(tmp_path / "ck2"), output_mode="append")
    got = {(r["id_a"], r["id_b"]) for r in spark.table("neardup_ev").collect()}
    assert (0, 1) in got          # within-slice-A pair
    assert (200, 201) in got      # within-slice-C pair
    # slice A members were evicted long before C arrived: no A x C pair
    assert not any(a < 100 <= b or b < 100 <= a for a, b in got)
