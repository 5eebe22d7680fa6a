"""Byte-pair encoding for training pipelines: a sample-trained subword
vocabulary (Sennrich et al. 2016, public) with distributed encoding — the
piece that turns the whitespace-token packing path into a
tokenizer-accurate one without external tokenizer deps.

Spark shape (the same sample-train / distributed-apply split as PQ
codebooks, ``ops/pq.py``):

- **train**: merges are learned driver-side from a bounded SAMPLE's word
  histogram — standard practice (production tokenizers train on a corpus
  slice, not the corpus), and the word histogram is tiny next to the text.
  The histogram itself is computed DISTRIBUTED (one explode + count
  aggregate, deterministic ``hash_sample`` sampling) and only the
  ``max_train_words`` most frequent words reach the driver.
- **encode**: one Arrow-batched ``mapInPandas`` pass applying the merge
  table. Within a batch, each DISTINCT word is encoded once through a
  per-task cache (Zipf makes the distinct-word set far smaller than the
  token stream), then the stream is rebuilt by lookup — the sanctioned
  Python escape hatch; real subword tokenization is not expressible as
  Column expressions.

Determinism contract: ties in pair frequency break lexicographically, so
the merge list is a pure function of (sample, vocab_size) — reproducible
across runs and cluster layouts; encoding is a pure function of (vocab,
text). Tested round-trip: concatenating a word's tokens (minus the
end-of-word marker) always reproduces the word.

Reference analogue: none (north-star training-pipeline extension per the
task brief).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EOW = "▁"  # end-of-word marker (visually distinct, not in normal text)


@dataclass(frozen=True)
class BpeVocab:
    """An ordered merge table. ``merges[i] = (left, right)`` — applied in
    order during training; during encoding, the pair with the LOWEST merge
    index present in a word merges first (the classic rank rule)."""

    merges: tuple  # tuple[tuple[str, str], ...]

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": [list(m) for m in self.merges]}, f)

    @classmethod
    def load(cls, path: str) -> "BpeVocab":
        with open(path) as f:
            data = json.load(f)
        return cls(merges=tuple((a, b) for a, b in data["merges"]))


def _word_symbols(word: str) -> tuple:
    return tuple(word[:-1]) + (word[-1] + _EOW,) if word else ()


def _encode_word(word: str, ranks: dict) -> list:
    """Classic rank-greedy BPE encode of one word."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    sample_fraction: float = 1.0,
    max_train_words: int = 100_000,
    salt: str = "bpe",
) -> BpeVocab:
    """Learn ``num_merges`` BPE merges from the corpus' word histogram.

    The histogram is distributed (explode + count); sampling uses the
    deterministic ``hash_sample`` bucket function so the training set —
    and therefore the merge list — is layout-invariant. Only the
    ``max_train_words`` most frequent words are pulled to the driver
    (ties broken by word so the cut is deterministic), bounding driver
    memory at any corpus size; rare-word truncation is standard tokenizer
    practice (singleton words contribute almost no pair mass).
    """
    from graflo_spark.ops.sampling import hash_sample

    toks = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    src = df.filter(F.col(text_col).isNotNull())
    if sample_fraction < 1.0:
        src = hash_sample(src, text_col, sample_fraction, salt=salt)
    hist = (
        src.select(toks)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_train_words)
        .collect()
    )
    words = {r["w"]: int(r["n"]) for r in hist}
    # driver-side classic training over the (word -> count) dict
    split = {w: list(_word_symbols(w)) for w in words}
    merges: list = []
    for _ in range(num_merges):
        pair_counts: dict = {}
        for w, syms in split.items():
            n = words[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # deterministic: max count, ties -> lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in split.items():
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return BpeVocab(merges=tuple(merges))


_ENC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("n_tok", T.IntegerType()),
    ]
)


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: BpeVocab,
) -> DataFrame:
    """Distributed BPE encode: ``(id, tokens, n_tok)`` per document. One
    Arrow-batched ``mapInPandas`` pass; the merge table travels in the
    task closure (a few thousand string pairs — KBs). Each task caches
    encodings per DISTINCT word, so cost tracks the vocabulary of the
    batch, not its length. NULL text encodes to an empty token list."""
    import pandas as pd

    ranks = vocab.ranks

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict = {}

        def enc(text) -> list:
            if text is None:
                return []
            out: list = []
            for w in text.strip().split():
                hit = cache.get(w)
                if hit is None:
                    hit = _encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        for pdf in batches:
            if not len(pdf):
                continue
            toks = [enc(t) for t in pdf["t"]]
            yield pd.DataFrame(
                {
                    "id": pdf["i"],
                    "tokens": toks,
                    "n_tok": [len(x) for x in toks],
                }
            )

    narrowed = df.select(
        F.col(id_col).cast("long").alias("i"), F.col(text_col).alias("t")
    )
    return narrowed.mapInPandas(run, schema=_ENC_SCHEMA)


def bpe_token_count(
    df: DataFrame, id_col: str, text_col: str, vocab: BpeVocab
) -> DataFrame:
    """``(id, n_tok)`` under the trained vocabulary — the drop-in token
    counter for :func:`graflo_spark.ops.packing.pack_chunks` when packing
    must be tokenizer-accurate rather than whitespace-approximate."""
    return bpe_encode(df, id_col, text_col, vocab).select("id", "n_tok")
