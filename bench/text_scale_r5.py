"""Round-5 text-pipeline scale evidence (round-4 verdict items 7 & 8).

Item 7 — batched BPE at a real merge budget: run an ACTUAL
``train_bpe(n_merges=4096, batch=256)`` train on the Heaps'-law
synthetic-corpus vocabulary (600k files, ~1.53M distinct words) and
report measured wall, not an extrapolated floor.  Parity vs the
classical serial trainer is measured at an equal merge count the
serial trainer can afford (``PARITY_MERGES``, default 256): merge-set
overlap plus weighted compression (sum over the vocabulary of
freq * len(tokens)) for both merge lists — the quality metric BPE
training optimizes.

Item 8 — the tokenizer's gated join at scale: ``encode_corpus`` on the
same corpus with the (word -> tokens) map join forced BOTH ways
(broadcast vs shuffle) at a vocabulary derived from the measured BPE
train, timed over interleaved reps.  The 1.53M-word distinct-word
table sits just past ``_BROADCAST_WORDS_LIMIT`` (1M), i.e. exactly the
regime where the round-4 ADVICE gate flips to the shuffle join — this
measures what that flip costs.

Usage:
    python bench/text_scale_r5.py            # full run, JSON per phase
    BPE_MERGES=512 BPE_BATCH=64 python ...   # smaller budgets
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = int(os.environ.get("TEXT_N_FILES", "600000"))
N_REPOS = int(os.environ.get("TEXT_N_REPOS", "60000"))
BPE_MERGES = int(os.environ.get("BPE_MERGES", "4096"))
BPE_BATCH = int(os.environ.get("BPE_BATCH", "256"))
PARITY_MERGES = int(os.environ.get("PARITY_MERGES", "256"))
ENC_REPS = int(os.environ.get("ENC_REPS", "2"))
CORPUS_PATH = os.environ.get(
    "TEXT_CORPUS", f"/tmp/linkgraph_text_corpus_{N_FILES}"
)


def _emit(tag: str, payload: dict) -> None:
    print(f"PHASEJSON {json.dumps({'phase': tag, **payload})}", flush=True)


def _weighted_tokens(wf, merges) -> int:
    """sum(freq * len(tokens)) over the vocabulary — total corpus
    tokens under the trained segmentation (the BPE objective)."""
    from pyspark.sql import functions as F

    from linkgraph.text.bpe import bpe_encode_words

    return (
        bpe_encode_words(wf, merges)
        .select((F.col("freq") * F.size("tokens")).alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from linkgraph.ingest.corpus import synthetic_corpus
    from linkgraph.session import build_session
    from linkgraph.text.bpe import train_bpe, word_frequencies
    from linkgraph.text.tokenize import encode_corpus

    spark = build_session("text-scale-r5", master="local[32]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(CORPUS_PATH, "_SUCCESS")):
        synthetic_corpus(
            spark, n_files=N_FILES, n_repos=N_REPOS, partitions=32
        ).write.mode("overwrite").parquet(CORPUS_PATH)
    corpus = spark.read.parquet(CORPUS_PATH)

    wf = word_frequencies(corpus, "content").localCheckpoint(eager=True)
    n_words = wf.count()
    _emit("vocab", {"n_files": N_FILES, "n_distinct_words": n_words})

    # --- item 7: the measured batched train -------------------------
    t0 = time.time()
    merges = train_bpe(corpus, col="content", n_merges=BPE_MERGES,
                       batch=BPE_BATCH)
    wall = time.time() - t0
    _emit("bpe_train", {
        "n_merges": len(merges), "batch": BPE_BATCH,
        "wall_s": round(wall, 1),
        "s_per_merge": round(wall / max(1, len(merges)), 4),
    })

    # Parity vs the classical greedy trainer at an equal, affordable
    # merge count: set overlap + the weighted-compression objective.
    t0 = time.time()
    serial = train_bpe(corpus, col="content", n_merges=PARITY_MERGES,
                       batch=1)
    serial_wall = time.time() - t0
    batched_prefix = merges[:PARITY_MERGES]
    base = wf.select(
        (F.col("freq") * F.length("word")).alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    _emit("bpe_parity", {
        "parity_merges": PARITY_MERGES,
        "serial_wall_s": round(serial_wall, 1),
        "serial_s_per_merge": round(serial_wall / PARITY_MERGES, 3),
        "overlap": len(set(serial) & set(batched_prefix)),
        "chars_unmerged": base,
        "tokens_serial": _weighted_tokens(wf, serial),
        "tokens_batched_prefix": _weighted_tokens(wf, batched_prefix),
    })

    # --- item 8: encode_corpus gate A/B -----------------------------
    # Vocabulary = every symbol the measured train can emit (all merge
    # products + single characters), the real post-BPE-train encode.
    vocab = sorted(
        {a + b for a, b in merges}
        | {c for a, b in merges for c in (a, b) if len(c) == 1}
        | set("abcdefghijklmnopqrstuvwxyz0123456789_./(),'\"=:#-")
    )
    _emit("encode_vocab", {"vocab_size": len(vocab)})
    times: dict[str, list[float]] = {"broadcast": [], "shuffle": []}
    totals = {}
    for rep in range(ENC_REPS):
        for mode in ("broadcast", "shuffle"):
            t0 = time.time()
            total = (
                encode_corpus(corpus, vocab, col="content", id_col="path",
                              broadcast_words=(mode == "broadcast"))
                .agg(F.sum("n_tokens")).collect()[0][0]
            )
            times[mode].append(round(time.time() - t0, 1))
            totals[mode] = total
    _emit("encode_gate", {
        "n_words": n_words,
        "broadcast_walls": times["broadcast"],
        "shuffle_walls": times["shuffle"],
        "broadcast_best_s": min(times["broadcast"]),
        "shuffle_best_s": min(times["shuffle"]),
        "totals_equal": totals["broadcast"] == totals["shuffle"],
        "total_tokens": totals["broadcast"],
    })
    spark.stop()


if __name__ == "__main__":
    main()
