"""Deterministic corpus tokenizer: text documents -> the pre-tokenized
sequence table the encode job consumes (doc_id, source, n_tok,
tokens list<int64>).

This closes the engine's own loop: ``documents --tokenize--> F1-shaped
table --encode_job--> blobs``.  The vocabulary is the corpus top-``size``
terms (frequency desc, word asc — the exact ``top_terms`` rank rule, so
the SQL twin is hash-exact); everything else maps to one OOV id.

Scale shape (100 TB): vocab construction is the ``top_terms``
partial-agg (shuffle carries (word, count) partials, never text); the
token pass is a stateful ACTOR-POOL ``map_batches`` stage — the vocab
dict is ``ray.put`` once and materialized per actor in ``__init__``
(never re-shipped per batch), each batch is one C-level pandas map +
one Arrow ListArray construction, and output lists stream straight into
``encode_job`` without driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_TOKEN_RE = r"[a-z0-9]+"


def build_vocab(docs: "ray.data.Dataset", size: int = 256) -> pd.DataFrame:
    """Corpus top-``size`` terms ranked (count desc, word asc), assigned
    token ids 0..size-1 in rank order. Returns (word, token_id)."""
    from .text_analysis import top_terms

    top = top_terms(docs, k=size)
    return pd.DataFrame({
        "word": top["word"].to_numpy(),
        "token_id": np.arange(len(top), dtype=np.int64),
    })


class TokenizerStage:
    """Actor-pool stage: vocab lookup built once per actor from the
    broadcast ref; per batch one vectorized findall + dict map."""

    def __init__(self, vocab_ref, oov_id: int):
        vocab: pd.DataFrame = ray.get(vocab_ref)
        self._map = dict(zip(vocab["word"], vocab["token_id"].astype(np.int64)))
        self._oov = np.int64(oov_id)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        words = batch["text"].fillna("").str.lower().str.findall(_TOKEN_RE)
        lens = words.str.len().to_numpy(dtype=np.int64)
        flat = (np.concatenate([np.asarray(x, dtype=object) for x in words])
                if lens.sum() else np.empty(0, dtype=object))
        ids = (pd.Series(flat, dtype=object).map(self._map)
               .fillna(self._oov).to_numpy(dtype=np.int64))
        offsets = np.concatenate([np.zeros(1, dtype=np.int32),
                                  np.cumsum(lens).astype(np.int32)])
        tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          pa.array(ids, type=pa.int64()))
        return pa.table({
            "doc_id": pa.array(batch["doc_id"].to_numpy(), type=pa.int64()),
            "source": pa.array(batch["source"], type=pa.string()),
            "n_tok": pa.array(lens, type=pa.int64()),
            "tokens": tokens,
        })


def tokenize(docs: "ray.data.Dataset", vocab: pd.DataFrame,
             oov_id: int | None = None,
             concurrency: tuple[int, int] | int = (1, 8)
             ) -> "ray.data.Dataset":
    """Map each document to its token-id sequence under ``vocab``;
    out-of-vocabulary words get ``oov_id`` (default: len(vocab))."""
    if oov_id is None:
        oov_id = len(vocab)
    ref = ray.put(vocab)
    return docs.map_batches(
        TokenizerStage, batch_format="pandas",
        fn_constructor_kwargs={"vocab_ref": ref, "oov_id": int(oov_id)},
        concurrency=concurrency)


def tokenize_corpus(docs: "ray.data.Dataset", vocab_size: int = 256
                    ) -> "ray.data.Dataset":
    """Two-pass convenience: build the top-k vocab (aggregate pass),
    then stream the token pass. The result is encode_job-ready."""
    return tokenize(docs, build_vocab(docs, size=vocab_size))


def token_frequencies(tok: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global token-id frequency histogram over a pre-tokenized sequence
    table (the north-rule input shape: ``tokens list<int64>``) — the
    vocabulary-usage / OOV-rate profile an encode job wants before
    choosing dictionary codecs.

    Scale shape (100 TB): per-block partials are ONE ``np.unique`` pass
    over the block's flattened token values (zero-copy from the Arrow
    list buffer, no per-row Python); the shuffle carries (token_id, n)
    partials bounded by the vocabulary size per block, never token
    streams. Merge is ``grouped_sum``."""
    from .groupagg import grouped_sum

    def partial(t: pa.Table) -> pd.DataFrame:
        vals = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ids, cnt = np.unique(vals, return_counts=True)
        return pd.DataFrame({"token_id": ids.astype(np.int64),
                             "n": cnt.astype(np.int64)})

    return grouped_sum(tok.map_batches(partial, batch_format="pyarrow"),
                       ["token_id"], ["n"])
