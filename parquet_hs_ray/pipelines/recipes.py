"""Composed end-to-end pipeline recipes.

The engine's operators are designed to compose into the full
preprocessing flows a training-data user actually runs; ``clean_corpus``
is the flagship composition — every stage is one of the already-oracled
primitives, chained as a single lazy Dataset pipeline (one streaming
pass per stage, no driver materialization between stages):

1. percentile length filter (``relational.filter_by_percentile``) —
   drop the shortest documents;
2. denylist anti-join (``relational.broadcast_join(how='anti')``) —
   remove opted-out / benchmark ids;
3. exact-dedup canonical keep (``dedup.dedup_assign`` + column
   compare) — first copy of each distinct text wins;
4. per-survivor whitespace token count (``functions.text``).

The whole chain is SQL-expressible, so the recipe carries ONE composed
hash-exact oracle (see ``oracle_sql()['corpus_pipeline']``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions import text as tx


def clean_corpus(docs: "ray.data.Dataset", denylist: "ray.data.Dataset",
                 quality_q: float = 0.5, len_col: str = "n_chars"
                 ) -> "ray.data.Dataset":
    """Length filter -> denylist removal -> exact dedup (first copy
    wins) -> token-count stats.  Returns (doc_id, source, n_ws_tokens)
    for every surviving document."""
    from .dedup import dedup_assign
    from .relational import broadcast_join, filter_by_percentile, hash_join

    kept = filter_by_percentile(docs, len_col, quality_q, keep="above")
    # denylists are dimension-sized (opt-outs / benchmark ids): broadcast
    kept = broadcast_join(kept, denylist, "doc_id", "doc_id", how="anti")

    assign = dedup_assign(kept)

    def keep_firsts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"] == batch["canonical_id"]][["doc_id"]]

    # the winner set is corpus-sized — co-locate by key hash, never
    # broadcast it
    winners = assign.map_batches(keep_firsts, batch_format="pandas")
    survivors = hash_join(kept, winners, "doc_id", "doc_id")

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"], "source": batch["source"],
            "n_ws_tokens": tx.ws_token_count(batch["text"]).astype(np.int64),
        })

    return survivors.map_batches(stats, batch_format="pandas")
