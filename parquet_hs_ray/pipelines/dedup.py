"""Deduplication pipelines over the documents table — Ray-Data-first.

Scale design notes (100 TB):
- exact: content hash (md5) computed vectorized inside ``map_batches``;
  the shuffle key is the 16-byte hash, never the document text, so the
  groupby moves ~32 B/row. Group representative = min(doc_id).
- minhash-LSH: shingle -> 64-perm minhash -> 16 bands inside one
  ``map_batches`` (mergeable-sketch pattern); explode to (band, bandhash)
  rows; ``groupby`` on band hash yields candidate buckets; exact-Jaccard
  verify runs per bucket in ``map_groups``. Only sketches and candidate
  pairs shuffle — raw text never does (at sf scale we re-read candidate
  texts from a broadcast id->shingles map; at 100 TB that map becomes a
  bucketed side table co-partitioned by doc_id).
- simhash: 64-bit signature + 4-way band blocking, hamming<=3 verify.
- embedding near-dup: cosine >= tau pairs via per-batch matmul against a
  broadcast (ray.put) normalized matrix — O(n^2) flops but no shuffle; the
  IVF variant in ann.py is the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import sketches as sk
from ..functions.text import md5_hex


def dedup_exact(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per distinct text: (doc_id=min over dup group, n_dups).

    SQL twin: SELECT min(doc_id) AS doc_id, count(*) AS n_dups
              FROM documents GROUP BY text.
    """

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"], "h": md5_hex(batch["text"])})

    from ray.data.aggregate import Count, Min

    hashed = docs.map_batches(add_hash, batch_format="pandas")
    agg = hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups"))
    return agg.select_columns(["doc_id", "n_dups"])


def _sig_batch(batch: pd.DataFrame, n_bands: int, ngram: int) -> pd.DataFrame:
    n_sh, hashes = sk.word_ngram_hashes(batch["text"], n=ngram)
    sig = sk.minhash_signatures(n_sh, hashes)
    bands = sk.minhash_bands(sig, n_bands=n_bands)
    n = len(batch)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_bands),
            "band": np.tile(np.arange(n_bands, dtype=np.int32), n),
            "bandhash": bands.reshape(-1).view(np.int64),
        }
    )


def minhash_candidate_pairs(docs: "ray.data.Dataset", n_bands: int = 16, ngram: int = 3) -> "ray.data.Dataset":
    """LSH candidate pairs (a < b), deduplicated across bands."""
    bands = docs.map_batches(
        lambda b: _sig_batch(b, n_bands, ngram), batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > 256:  # skip degenerate giant buckets
            return pd.DataFrame({"a": [], "b": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = bands.groupby(["band", "bandhash"]).map_groups(bucket_pairs, batch_format="pandas")
    from ray.data.aggregate import Count

    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands_hit")).select_columns(["a", "b", "n_bands_hit"])


def dedup_minhash(docs: "ray.data.Dataset", threshold: float = 0.8, ngram: int = 3) -> pd.DataFrame:
    """Near-duplicate pairs with exact word-ngram Jaccard >= threshold.

    Candidate pairs come from LSH; verification recomputes shingle sets for
    candidate docs only (broadcast of the candidate subset — small by
    construction)."""
    cand = minhash_candidate_pairs(docs, ngram=ngram).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
                             "jaccard": pd.Series([], dtype=float)})
    need = set(cand["a"]) | set(cand["b"])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["doc_id"].isin(need)
        return batch.loc[m, ["doc_id", "text"]]

    subset = docs.map_batches(keep, batch_format="pandas").to_pandas()
    shingles: dict = {}
    n_sh, hashes = sk.word_ngram_hashes(subset["text"], n=ngram)
    offs = np.concatenate([[0], np.cumsum(n_sh)])
    for i, did in enumerate(subset["doc_id"]):
        shingles[did] = np.unique(hashes[offs[i] : offs[i + 1]])
    jac = sk.jaccard_pairs([shingles[a] for a in cand["a"]], [shingles[b] for b in cand["b"]])
    cand = cand.assign(jaccard=jac)
    out = cand[cand["jaccard"] >= threshold][["a", "b", "jaccard"]]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


_EMPTY_SIM_PAIRS = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})


def dedup_simhash(docs: "ray.data.Dataset", max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by simhash banding + hamming verify.

    4x16-bit band blocking guarantees recall for hamming <= 3 (pigeonhole);
    larger ``max_hamming`` values are best-effort."""

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        n_sh, hashes = sk.char_shingle_hashes(batch["text"], k=5)
        s = sk.simhash64(n_sh, hashes)
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": s})

    sigs = docs.map_batches(sig, batch_format="pandas")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().view(np.uint64)
        n = len(batch)
        parts = []
        for band in range(4):  # 4x16-bit bands: hamming<=3 => >=1 exact band
            bh = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pd.DataFrame({"doc_id": batch["doc_id"], "simhash": batch["simhash"],
                                       "band": band, "bandkey": bh}))
        return pd.concat(parts)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        if len(ids) < 2 or len(ids) > 256:
            return _EMPTY_SIM_PAIRS.copy()
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = sk.hamming64(hs[ii], hs[jj])
        m = ham <= max_hamming
        return pd.DataFrame({"a": ids[ii][m], "b": ids[jj][m],
                             "hamming": ham[m].astype(np.int64)})

    pairs = sigs.map_batches(explode, batch_format="pandas").groupby(["band", "bandkey"]).map_groups(
        bucket_pairs, batch_format="pandas"
    ).to_pandas()
    if len(pairs) == 0 or "a" not in pairs.columns:
        return _EMPTY_SIM_PAIRS.copy()
    out = pairs.drop_duplicates(subset=["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_neardup_pairs(emb: "ray.data.Dataset", tau: float = 0.5) -> pd.DataFrame:
    """Pairs (a < b) with cosine similarity >= tau.

    SQL twin (cross join + list_cosine_similarity). The full normalized
    matrix is broadcast once via ray.put; each batch does one float64
    matmul against it — compute-parallel, shuffle-free."""
    full = emb.to_pandas()
    ids = full["vec_id"].to_numpy()
    M = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, Mn))

    def batch_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, allM = ray.get(ref)
        bids = batch["vec_id"].to_numpy()
        B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        sims = Bn @ allM.T
        ii, jj = np.nonzero(sims >= tau)
        m = bids[ii] < all_ids[jj]  # dedupe + drop self
        return pd.DataFrame({"a": bids[ii][m], "b": all_ids[jj][m]})

    out = emb.map_batches(batch_pairs, batch_format="pandas").to_pandas()
    if len(out) == 0 or "a" not in out.columns:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
