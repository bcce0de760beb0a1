"""Text-analysis pipelines over the documents table (SQL-twinned where the
kernel is SQL-expressible; see __ray_entry__.oracle_sql)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions import text as tx


def token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": tx.ws_token_count(batch["text"]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def quality_scores(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        comp = tx.quality_components(batch["text"])
        return pd.DataFrame({"doc_id": batch["doc_id"], **comp})

    return docs.map_batches(f, batch_format="pandas")


def fingerprints(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "fingerprint_md5": tx.md5_hex(batch["text"])}
        )

    return docs.map_batches(f, batch_format="pandas")


def language_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, lang_pred, lang_score) — SQL-expressible (marker-word hit
    ratio + argmax with ascending-code tie-break), so it carries a hard
    DuckDB oracle (VERDICT r1 #6 direction)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        lang, score = tx.lang_id(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": lang,
                # raw double ratio: bit-identical to DuckDB's k/n division
                # (no rounding — round() tie-break rules differ across engines)
                "lang_score": score,
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def text_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Rolling fingerprint + BPE-ish token count. Not SQL-expressible
    (uint64 wraparound math; RE2 has no lookahead for the BPE pattern) —
    rows-only oracle; kernel determinism is unit-tested."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint_roll": tx.rolling_fingerprint(batch["text"]),
                "n_bpe_tokens": tx.bpe_token_count(batch["text"]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def stats_by_source(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source aggregate via the partial-aggregation pattern: one partial
    row per (source) per batch inside map_batches, then a tiny groupby over
    the partials — the shuffle moves O(sources * batches) rows, not O(rows).

    SQL twin: SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars,
    sum(CASE ws count END) AS sum_ws_tokens FROM documents GROUP BY source.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ws = tx.ws_token_count(batch["text"])
        g = pd.DataFrame(
            {"source": batch["source"], "n_chars": batch["n_chars"], "ws": ws}
        ).groupby("source", sort=False)
        out = g.agg(n_docs=("ws", "size"), sum_chars=("n_chars", "sum"), sum_ws_tokens=("ws", "sum"))
        return out.reset_index()

    partials = docs.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    return partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("sum_ws_tokens", alias_name="sum_ws_tokens"),
    )


def top_terms(docs: "ray.data.Dataset", k: int = 50) -> pd.DataFrame:
    """Corpus-wide top-k term frequencies.

    Partial-agg pattern: per-batch word counts (one np.unique per batch),
    ``groupby(word).aggregate(Sum)`` — the shuffle carries (word, count)
    partials, never text — then distributed per-block top-k with only
    k rows per block reaching the driver merge. Tie-break (n desc, word
    asc) matches the SQL oracle exactly.

    SQL twin: regexp_extract_all(lower(text), '[a-z0-9]+') -> unnest ->
    GROUP BY -> ORDER BY n DESC, word LIMIT k.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
        flat = [w for ws in words for w in ws]
        if not flat:
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        uniq, counts = np.unique(np.asarray(flat, dtype=object), return_counts=True)
        return pd.DataFrame({"word": uniq, "n": counts.astype(np.int64)})

    from ray.data.aggregate import Sum

    agg = docs.map_batches(partial, batch_format="pandas").groupby("word").aggregate(
        Sum("n", alias_name="n")
    )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if "word" not in batch.columns or not len(batch):
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        return batch.sort_values(["n", "word"], ascending=[False, True]).head(k)

    # words are unique after the aggregate, so the global top-k is contained
    # in the union of per-block top-ks: only k rows/block reach the driver
    cands = agg.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = cands.sort_values(["n", "word"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"n": np.int64})
