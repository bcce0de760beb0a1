"""Operator pipeline tests (dedup / ANN / text analysis / multimodal) at
sf0.001, plus kernel determinism checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_dedup_exact_matches_pandas(docs):
    from parquet_hs_ray.pipelines.dedup import dedup_exact

    ours = dedup_exact(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    raw = docs.to_pandas()
    ref = (
        raw.groupby("text", sort=False)
        .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        .reset_index(drop=True)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ours.astype({"n_dups": np.int64}), ref.astype({"n_dups": np.int64}))


def test_minhash_finds_planted_dups(ray_session):
    """Plant near-duplicate docs; minhash must find them."""
    import ray.data

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("lazy", "sleepy", 1)},
            {"doc_id": 3, "text": "completely different content with unrelated words " * 15},
            {"doc_id": 4, "text": base + "extra tail words here"}]
    ds = ray.data.from_items(rows)
    from parquet_hs_ray.pipelines.dedup import dedup_minhash

    pairs = dedup_minhash(ds, threshold=0.5)
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert not any(3 in p for p in got)


def test_minhash_candidate_branches_agree(ray_session):
    """The adaptive local-dedup path (pairs coalesced to one block) and
    the shuffle path (small_rows=0 forces groupby/aggregate) produce the
    identical candidate set with identical n_bands_hit / giant flags."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import minhash_candidate_pairs

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(400)]
    rows = []
    for d in range(60):
        base = " ".join(rng.choice(words, 80))
        rows.append({"doc_id": 2 * d, "text": base})
        # near-dup twin for even d
        if d % 2 == 0:
            rows.append({"doc_id": 2 * d + 1,
                         "text": base.replace(base.split()[3], "zz", 1)})
    ds = ray.data.from_items(rows).repartition(8)

    def run(small_rows):
        out = minhash_candidate_pairs(ds, small_rows=small_rows).to_pandas()
        return out.sort_values(["a", "b"]).reset_index(drop=True)

    local, shuffled = run(2_000_000), run(0)
    assert len(local) > 0
    pd.testing.assert_frame_equal(
        local[["a", "b", "n_bands_hit", "giant"]].astype(np.int64),
        shuffled[["a", "b", "n_bands_hit", "giant"]].astype(np.int64))


def test_simhash_finds_planted_dups(ray_session):
    import ray.data

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base[:-3]},
            {"doc_id": 3, "text": "zzz completely different material qqq " * 20}]
    from parquet_hs_ray.pipelines.dedup import dedup_simhash

    pairs = dedup_simhash(ray.data.from_items(rows), max_hamming=6)
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_ann_bruteforce_matches_numpy(emb):
    from parquet_hs_ray.pipelines.ann import ann_topk_bruteforce

    out = ann_topk_bruteforce(emb, query_ids=[0, 1], k=5)
    full = emb.to_pandas()
    M = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = full["vec_id"].to_numpy()
    for q in (0, 1):
        qi = np.flatnonzero(ids == q)[0]
        sims = Mn @ Mn[qi]
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))
        expect = [ids[j] for j in order if ids[j] != q][:5]
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == expect


def test_ann_ivf_recall(emb):
    """IVF with nprobe=all clusters == brute force; fewer probes -> recall>0.5."""
    from parquet_hs_ray.pipelines.ann import ann_topk_bruteforce, ann_topk_ivf

    exact = ann_topk_bruteforce(emb, query_ids=[0], k=10)
    approx = ann_topk_ivf(emb, query_ids=[0], k=10, n_clusters=8, nprobe=8)
    assert set(approx["neighbor_id"]) == set(exact["neighbor_id"])  # all probes = exact
    approx2 = ann_topk_ivf(emb, query_ids=[0], k=10, n_clusters=8, nprobe=3)
    recall = len(set(approx2["neighbor_id"]) & set(exact["neighbor_id"])) / 10
    assert recall >= 0.5


def test_text_kernels_deterministic():
    from parquet_hs_ray.functions import text as tx

    s = pd.Series(["Hello World 123", "", "  ", "àéî ü", None])
    assert tx.ws_token_count(s).tolist() == [3, 0, 0, 2, 0]
    a = tx.md5_hex(s)
    assert a[0] == "cd33bbd32ecd4d2e0ce1f37a1b68b348" or len(a[0]) == 32
    f1 = tx.rolling_fingerprint(s)
    f2 = tx.rolling_fingerprint(s)
    np.testing.assert_array_equal(f1, f2)
    lang, score = tx.lang_id(pd.Series(["the cat and the dog in the house", "der hund und die katze"]))
    assert lang.tolist() == ["en", "de"]


def test_sketch_determinism_across_chunking():
    """Signatures must not depend on batch boundaries (PYTHONHASHSEED trap)."""
    from parquet_hs_ray.functions import sketches as sk

    texts = pd.Series(["alpha beta gamma delta epsilon zeta", "one two three four five six seven"])
    n1, h1 = sk.word_ngram_hashes(texts)
    n1a, h1a = sk.word_ngram_hashes(texts[:1])
    n1b, h1b = sk.word_ngram_hashes(texts[1:].reset_index(drop=True))
    np.testing.assert_array_equal(h1, np.concatenate([h1a, h1b]))
    sig = sk.minhash_signatures(n1, h1)
    assert sig.shape == (2, 64)


def test_multimodal_stage(ray_session):
    import ray.data

    from parquet_hs_ray.stages.multimodal import MediaFeatureStage, media_features

    rows = [{"media_id": i, "payload": bytes([i]) * (100 + i)} for i in range(10)]
    ds = ray.data.from_items(rows)
    out = media_features(ds, concurrency=2, batch_size=4).to_pandas()
    # Ray Data does not preserve block order by default — sort before asserting
    out = out.sort_values("media_id").reset_index(drop=True)
    assert len(out) == 10
    assert out["n_bytes"].tolist() == [100 + i for i in range(10)]
    assert all(len(f) == 8 for f in out["features"])
    # real decode now exists for PNG/WAV (media_codecs); an opaque
    # non-media payload must still fail loudly, per payload
    with pytest.raises(NotImplementedError):
        import pyarrow as _pa

        MediaFeatureStage(decode_real=True)(
            _pa.table({"media_id": _pa.array([0], _pa.int64()),
                       "payload": _pa.array([b"not-a-media-file"], _pa.binary())}))


def test_stats_by_source_partial_agg(docs):
    from parquet_hs_ray.pipelines.text_analysis import stats_by_source

    out = stats_by_source(docs).to_pandas()
    raw = docs.to_pandas()
    assert int(out["n_docs"].sum()) == len(raw)
    assert int(out["sum_chars"].sum()) == int(raw["n_chars"].sum())


def test_tumbling_window_matches_pandas(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.windows import tumbling_window

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    ours = tumbling_window(ev).to_pandas().sort_values(["user_id", "win"]).reset_index(drop=True)
    raw = ev.to_pandas()
    raw["win"] = raw["ts"].astype("int64") // 3_600_000_000
    ref = (raw.groupby(["user_id", "win"])
              .agg(n_events=("value", "size"), sum_value=("value", "sum"))
              .reset_index().sort_values(["user_id", "win"]).reset_index(drop=True))
    ref["sum_value"] = ref["sum_value"].round(6)
    assert len(ours) == len(ref)
    pd.testing.assert_frame_equal(
        ours.astype({"n_events": np.int64}), ref.astype({"n_events": np.int64}),
        check_like=True, atol=1e-6,
    )


def test_funnel_order_sensitivity(ray_session):
    """First-touch ordered funnel: a click BEFORE the first view does not
    advance the funnel; equal timestamps are not 'after'; users with no
    stage-1 event are absent."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import funnel

    t0 = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # u1: full ordered funnel
        (1, t0, "view"), (1, t0 + s, "click"), (1, t0 + 2 * s, "purchase"),
        # u2: click precedes the first view -> stuck at stage 1
        (2, t0, "click"), (2, t0 + s, "view"),
        # u3: purchase without a click after view -> stage 1
        (3, t0, "view"), (3, t0 + s, "purchase"),
        # u4: click at the SAME ts as the first view -> not strictly after
        (4, t0, "view"), (4, t0, "click"),
        # u5: no view at all -> absent
        (5, t0, "click"), (5, t0 + s, "purchase"),
        # u6: view -> click, then purchase equal to click ts -> stage 2
        (6, t0, "view"), (6, t0 + s, "click"), (6, t0 + s, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ds = ray.data.from_pandas([df.iloc[:5], df.iloc[5:9], df.iloc[9:]])
    out = (funnel(ds, ["view", "click", "purchase"]).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2, 3, 4, 6]
    assert out["n_stages"].tolist() == [3, 1, 1, 1, 2]


def test_sessionize_counts(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.windows import sessionize

    rows = [
        {"user_id": 1, "ts": 0, "value": 1.0},
        {"user_id": 1, "ts": 10, "value": 1.0},
        {"user_id": 1, "ts": 10**12, "value": 1.0},  # new session (gap > 30min)
        {"user_id": 2, "ts": 5, "value": 1.0},
    ]
    import pyarrow as pa

    tbl = pa.table({"user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
                    "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
                    "value": pa.array([r["value"] for r in rows])})
    ds = ray.data.from_arrow(tbl)
    out = sessionize(ds).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[2, "n_sessions"] == 1


def test_resize_and_frame_sample_stages(ray_session):
    import ray.data

    from parquet_hs_ray.stages.multimodal import FrameSampleStage, ImageResizeStage

    rows = [{"media_id": i, "payload": bytes(range(256)) * 300} for i in range(6)]
    ds = ray.data.from_items(rows)
    resized = ds.map_batches(ImageResizeStage, fn_constructor_kwargs={"width": 16, "height": 16},
                             batch_size=3, concurrency=2, batch_format="pyarrow").to_pandas()
    assert len(resized) == 6 and all(len(p) == 256 for p in resized["payload"])
    frames = ds.map_batches(FrameSampleStage, fn_constructor_kwargs={"n_frames": 4},
                            batch_size=3, concurrency=2, batch_format="pyarrow").to_pandas()
    assert len(frames) == 24
    assert sorted(frames["frame_index"].unique()) == [0, 1, 2, 3]
    # real decode exists for PNG (resize) / WAV (frames); opaque bytes
    # still fail loudly per payload
    bad = pa.table({"media_id": pa.array([0], pa.int64()),
                    "payload": pa.array([b"definitely-not-png"], pa.binary())})
    with pytest.raises(NotImplementedError):
        ImageResizeStage(decode_real=True)(bad)
    with pytest.raises(NotImplementedError):
        FrameSampleStage(decode_real=True)(bad)


def test_lsh_giant_bucket_star_fallback(ray_session):
    """Over-cap LSH buckets must not silently drop (VERDICT r1 #10): the
    star fallback keeps every member reachable via the bucket min, and the
    result counts the affected pairs in attrs."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import dedup_minhash, dedup_simhash

    base = "the quick brown fox jumps over the lazy dog " * 10
    rows = [{"doc_id": i, "text": base} for i in range(12)]
    ds = ray.data.from_items(rows)

    pairs = dedup_minhash(ds, threshold=0.9, bucket_cap=8)
    # star: doc 0 paired with every other doc; identical texts -> jaccard 1
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert got == {(0, i) for i in range(1, 12)}
    assert pairs.attrs["n_giant_bucket_pairs"] == len(pairs)

    spairs = dedup_simhash(ds, max_hamming=3, bucket_cap=8)
    sgot = {(int(a), int(b)) for a, b in zip(spairs["a"], spairs["b"])}
    assert sgot == {(0, i) for i in range(1, 12)}
    assert spairs.attrs["n_giant_bucket_pairs"] >= len(spairs)

    # under-cap: full all-pairs, nothing flagged
    full = dedup_minhash(ds, threshold=0.9, bucket_cap=100)
    assert len(full) == 12 * 11 // 2
    assert full.attrs["n_giant_bucket_pairs"] == 0


def test_ivf_persisted_index(emb, tmp_path):
    """ivf_build_index writes cluster-partitioned parquet + centroids; the
    indexed search reads only probed clusters and matches the exact top-k
    when probing everything."""
    import numpy as np

    from parquet_hs_ray.pipelines.ann import (
        ann_topk_bruteforce,
        ann_topk_ivf_indexed,
        ivf_build_index,
    )

    idx = str(tmp_path / "ivf")
    C = ivf_build_index(emb, idx, n_clusters=8)
    assert C.shape[0] == 8
    import os
    parts = [d for d in os.listdir(f"{idx}/data") if d.startswith("cluster=")]
    assert 1 < len(parts) <= 8

    full = emb.to_pandas()
    qrow = full[full["vec_id"] == 0].iloc[0]
    qv = np.asarray([qrow["embedding"]], dtype=np.float64)

    exact = ann_topk_bruteforce(emb, query_ids=[0], k=10)
    allprobe = ann_topk_ivf_indexed(idx, np.asarray([0]), qv, k=10, nprobe=8)
    assert set(allprobe["neighbor_id"]) == set(exact["neighbor_id"])
    assert allprobe.attrs["clusters_read"] == len(parts)

    few = ann_topk_ivf_indexed(idx, np.asarray([0]), qv, k=10, nprobe=2)
    assert few.attrs["clusters_read"] <= 2  # partial scan, by construction
    recall = len(set(few["neighbor_id"]) & set(exact["neighbor_id"])) / 10
    assert recall >= 0.3


def test_ivf_index_files_plain_arrow(emb, tmp_path):
    """Regression (flaky ann_ivf_indexed): index part files written through
    a pandas stage carried an ``numpy.ndarray(shape=..., dtype=...)``
    extension dtype in their pandas metadata, which intermittently broke
    pandas-format reads of the index. The build stage is pure Arrow now —
    the files must carry NO pandas metadata and a pandas-format read of
    every written file must succeed."""
    import glob

    import pyarrow.parquet as pq

    from parquet_hs_ray.pipelines.ann import ivf_build_index

    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, idx, n_clusters=4)
    files = glob.glob(f"{idx}/data/cluster=*/*.parquet")
    assert files
    for f in files:
        meta = pq.read_schema(f).metadata or {}
        pandas_meta = meta.get(b"pandas", b"")
        assert b"numpy.ndarray" not in pandas_meta, f
        # the poisoned metadata made this raise ValueError
        pq.read_table(f).to_pandas()


def test_resize_frame_content_equality(ray_session):
    """Vectorized offset-slicing must reproduce the per-row slicing
    semantics exactly (variable lengths, empty payloads, sliced arrays)."""
    import pyarrow as pa

    from parquet_hs_ray.stages.multimodal import FrameSampleStage, ImageResizeStage

    payloads = [bytes(range(256)) * 3, b"", b"short", bytes(1000), b"x" * 300]
    t = pa.table({"media_id": pa.array(range(5), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    # exercise non-zero offset too
    for tbl in (t, t.slice(1)):
        r = ImageResizeStage(width=4, height=4)(tbl)
        ids = tbl["media_id"].to_pylist()
        want = [p[:16] for p in tbl["payload"].to_pylist()]
        assert r["payload"].to_pylist() == want
        assert r["media_id"].to_pylist() == ids

        f = FrameSampleStage(n_frames=3)(tbl)
        got = list(zip(f["media_id"].to_pylist(), f["frame_index"].to_pylist(),
                       f["frame"].to_pylist()))
        want_f = []
        for mid, p in zip(ids, tbl["payload"].to_pylist()):
            step = max(1, len(p) // 3)
            for k in range(3):
                want_f.append((mid, k, p[k * step : k * step + step]))
        assert got == want_f


def test_minhash_join_verify_path(ray_session):
    """Force the hash-join verify strategy (broadcast_threshold=0) and
    check it agrees with the broadcast strategy."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import dedup_minhash

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("lazy", "sleepy", 1)},
            {"doc_id": 3, "text": "completely different content with unrelated words " * 15},
            {"doc_id": 4, "text": base + "extra tail words here"}]
    ds = ray.data.from_items(rows)
    via_join = dedup_minhash(ds, threshold=0.5, broadcast_threshold=0)
    via_bcast = dedup_minhash(ds, threshold=0.5)
    pd.testing.assert_frame_equal(via_join, via_bcast)
    assert {(1, 2), (1, 4), (2, 4)} <= {(int(a), int(b)) for a, b in zip(via_join["a"], via_join["b"])}


def test_sessionize_matches_pandas_across_blocks(ray_session):
    """The sort+partials sessionize must match a single-process reference
    even when users straddle many blocks (junction-correction path)."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import sessionize

    ev = ray.data.read_parquet(f"{SF}/events.parquet").repartition(16)
    ours = sessionize(ev).to_pandas().sort_values("user_id").reset_index(drop=True)

    raw = ray.data.read_parquet(f"{SF}/events.parquet").to_pandas()
    ts = raw["ts"].astype("datetime64[us]").astype("int64")
    ref_rows = []
    for uid, g in pd.DataFrame({"user_id": raw["user_id"], "t": ts}).groupby("user_id"):
        t = np.sort(g["t"].to_numpy())
        breaks = int((np.diff(t) > 30 * 60 * 1_000_000).sum()) if len(t) > 1 else 0
        ref_rows.append({"user_id": uid, "n_sessions": breaks + 1, "n_events": len(t)})
    ref = pd.DataFrame(ref_rows).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ours.astype({"n_sessions": np.int64, "n_events": np.int64}),
        ref.astype({"n_sessions": np.int64, "n_events": np.int64}),
    )


def test_top_terms_matches_pandas(docs):
    from parquet_hs_ray.pipelines.text_analysis import top_terms

    out = top_terms(docs, k=10)
    raw = docs.to_pandas()
    words = raw["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    flat = pd.Series([w for ws in words for w in ws])
    ref = (flat.value_counts().rename_axis("word").reset_index(name="n")
           .sort_values(["n", "word"], ascending=[False, True]).head(10)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype({"n": np.int64}), ref.astype({"n": np.int64}))


def test_unigram_surprisal_matches_bruteforce(docs):
    """Integer-exact perplexity proxy: the distributed score must equal a
    driver-side brute-force recompute (exact Python-int bit_length math),
    and empty/word-free docs must appear with 0s."""
    from collections import Counter

    from parquet_hs_ray.pipelines.text_analysis import unigram_surprisal

    out = (unigram_surprisal(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    raw = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    words = raw["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    freq = Counter(w for ws in words for w in ws)
    n, v = sum(freq.values()), len(freq)
    smap = {w: ((n + v) // (c + 1)).bit_length() - 1 for w, c in freq.items()}
    ref = pd.DataFrame({
        "doc_id": raw["doc_id"],
        "n_words": np.asarray([len(ws) for ws in words], dtype=np.int64),
        "surprisal_sum": np.asarray(
            [sum(smap[w] for w in ws) for ws in words], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) == len(raw)  # every doc present, even zero-word ones


def test_bm25_matches_bruteforce(docs):
    """BM25 vs a driver-side recompute with the same formula; absent
    query terms contribute nothing; zero-score docs are omitted."""
    import math
    import re

    from parquet_hs_ray.pipelines.text_analysis import bm25_score

    terms = ["column", "merge", "zebra"]  # zebra absent from the corpus
    out = (bm25_score(docs, terms).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    raw = docs.to_pandas()
    W = re.compile(r"[a-z0-9]+")
    words = [W.findall(str(t).lower()) for t in raw["text"].fillna("")]
    n = len(raw)
    sdl = sum(len(w) for w in words)
    avgdl = sdl / n
    k1, b = 1.2, 0.75
    dfs = {t: sum(t in set(w) for w in words) for t in terms}
    assert dfs["zebra"] == 0
    scores = {}
    for did, ws in zip(raw["doc_id"], words):
        s = 0.0
        for t in sorted(terms):
            tf = float(ws.count(t))
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s = s + idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            scores[did] = s
    assert out["doc_id"].tolist() == sorted(scores)
    for did, sc in zip(out["doc_id"], out["score"]):
        assert sc == scores[did], did


def test_inverted_index_matches_bruteforce(docs):
    """Capped postings: exact df counts, first-k ascending doc_ids; must be
    invariant to block layout (fragment-merge path exercised via a 7-block
    re-read)."""
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import inverted_index

    raw = docs.to_pandas()
    words = raw["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    ref = {}
    for did, ws in zip(raw["doc_id"], words):
        for w in set(ws):
            ref.setdefault(w, []).append(did)
    for w in ref:
        ref[w] = sorted(ref[w])

    for ds in (docs, ray.data.read_parquet(f"{SF}/documents.parquet",
                                           override_num_blocks=7)):
        out = inverted_index(ds, k=4).to_pandas()
        assert len(out) == len(ref)
        got = {r.word: (r.n_docs, list(r.postings))
               for r in out.itertuples(index=False)}
        for w, ids in ref.items():
            assert got[w] == (len(ids), ids[:4]), w


def test_dedup_containment_quote_detection(ray_session):
    """A short doc fully quoted inside a long one scores containment 1.0
    as src (while its Jaccard is far below threshold); the long doc does
    not score as src; directed output matches a brute-force recompute."""
    import ray.data

    from parquet_hs_ray.functions import sketches as sk
    from parquet_hs_ray.pipelines.dedup import dedup_containment

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [quote, filler + " " + quote + " " + filler,
                 "completely unrelated words here", ""],
    })
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])
    out = dedup_containment(ds, threshold=0.9, rows_per_block=2)
    got = set(zip(out["src"], out["dst"]))
    assert (1, 2) in got            # quote contained in long doc
    assert (2, 1) not in got        # long doc not contained in quote
    assert not any(4 in p for p in got)  # zero-shingle doc emits nothing
    row = out[(out["src"] == 1) & (out["dst"] == 2)]
    assert row["containment"].iloc[0] == 1.0

    # brute force over shingle sets
    sets = {}
    for r in df.itertuples(index=False):
        _, h = sk.word_ngram_hashes(pd.Series([r.text]), n=3)
        sets[r.doc_id] = set(h.tolist())
    expect = set()
    for a in sets:
        for b in sets:
            if a != b and sets[a] and len(sets[a] & sets[b]) / len(sets[a]) >= 0.9:
                expect.add((a, b))
    assert got == expect


def test_unigram_surprisal_zero_word_docs(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import unigram_surprisal

    t = pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": ["", "   ", "rare common common"]})
    out = (unigram_surprisal(ray.data.from_pandas(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [0, 0, 3]
    assert out.loc[0, "surprisal_sum"] == 0 and out.loc[1, "surprisal_sum"] == 0
    # N=3, V=2: rare -> (5//2).bit_length()-1 = 1; common -> (5//3).bit_length()-1 = 0
    assert out.loc[2, "surprisal_sum"] == 1


def test_dedup_assign_matches_pandas(docs):
    from parquet_hs_ray.pipelines.dedup import dedup_assign

    out = dedup_assign(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    raw = docs.to_pandas()
    ref = pd.DataFrame({
        "doc_id": raw["doc_id"],
        "canonical_id": raw.groupby("text")["doc_id"].transform("min"),
    }).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)
    # keep/drop decision: kept docs = one per distinct text
    kept = out[out["doc_id"] == out["canonical_id"]]
    assert len(kept) == raw["text"].nunique()


def test_emb_neardup_srp_planted_and_exact_precision(emb):
    """SRP-LSH: planted cos~0.998 duplicates are all found, every output
    pair's cosine is exactly >= tau (verify is exact), and reruns are
    bit-identical (no RNG state)."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import embedding_neardup_srp

    raw = emb.to_pandas()
    M = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    planted = raw.head(15).copy()
    J = (np.stack(planted["embedding"].to_numpy()).astype(np.float64))
    J = J + 0.05 * np.roll(J, 1, axis=1)
    planted["vec_id"] = planted["vec_id"] + 1_000_000
    planted["embedding"] = list(J.astype(np.float32))
    aug = pd.concat([raw, planted]).reset_index(drop=True)
    ds = ray.data.from_pandas([aug.iloc[i::5].reset_index(drop=True)
                               for i in range(5)])

    out = embedding_neardup_srp(ds, tau=0.9)
    out2 = embedding_neardup_srp(ds, tau=0.9)
    pd.testing.assert_frame_equal(out, out2)  # deterministic

    found = set(zip(out["a"], out["b"]))
    for i in range(15):  # every planted dup recovered
        assert (i, i + 1_000_000) in found, i

    # exact precision: recompute each reported cosine from the raw data
    all_v = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
             for r in aug.itertuples(index=False)}
    for r in out.itertuples(index=False):
        va, vb = all_v[r.a], all_v[r.b]
        c = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert c >= 0.9 and abs(c - r.cos) < 1e-12
    assert "n_candidates" in out.attrs


def test_emb_neardup_ivf_recall(emb):
    """The bucketed approximate path must find most (here: all, with full
    probing) of the exact pairs and no false positives."""
    from parquet_hs_ray.pipelines.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_ivf,
    )

    exact = embedding_neardup_pairs(emb, tau=0.3)
    exact_set = set(zip(exact["a"], exact["b"]))
    approx = embedding_neardup_pairs_ivf(emb, tau=0.3, n_clusters=8, nprobe=8)
    approx_set = set(zip(approx["a"], approx["b"]))
    assert approx_set == exact_set  # nprobe == n_clusters -> every pair shares a bucket
    few = embedding_neardup_pairs_ivf(emb, tau=0.3, n_clusters=8, nprobe=2)
    few_set = set(zip(few["a"], few["b"]))
    assert few_set <= exact_set  # no false positives ever
    if exact_set:
        assert len(few_set) / len(exact_set) >= 0.5


def test_dedup_normalized(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.dedup import dedup_normalized

    rows = [{"doc_id": 1, "text": "Hello   World"},
            {"doc_id": 2, "text": "hello world"},
            {"doc_id": 3, "text": " HELLO\tWORLD \n"},
            {"doc_id": 4, "text": "different"}]
    out = dedup_normalized(ray.data.from_items(rows)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 4]
    assert out["n_dups"].tolist() == [3, 1]


def test_doc_top_terms(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import doc_top_terms

    rows = [{"doc_id": 1, "text": "apple apple banana cherry"},
            {"doc_id": 2, "text": "banana banana banana apple"},
            {"doc_id": 3, "text": ""}]
    out = doc_top_terms(ray.data.from_items(rows), k=2).to_pandas()
    out = out.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    # doc 1: apple tf=2; then banana vs cherry tf=1 each -> banana df=2 > cherry df=1,
    # asc df prefers cherry
    d1 = out[out["doc_id"] == 1]
    assert d1["word"].tolist() == ["apple", "cherry"]
    d2 = out[out["doc_id"] == 2]
    assert d2["word"].tolist() == ["banana", "apple"]
    assert 3 not in set(out["doc_id"])  # empty doc -> no rows


def test_deterministic_mix(docs):
    from parquet_hs_ray.pipelines.text_analysis import deterministic_mix

    raw = docs.to_pandas()
    src0 = raw["source"].iloc[0]
    out = deterministic_mix(docs, {src0: 0}).to_pandas()
    assert src0 not in set(out["source"])  # pct 0 drops the source entirely
    # determinism: same result twice
    out2 = deterministic_mix(docs, {src0: 0}).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # half-rate keeps roughly half (hash-uniform)
    half = deterministic_mix(docs, {}, default_pct=50).to_pandas()
    assert 0.3 < len(half) / len(raw) < 0.7


def test_pack_sequences(ray_session):
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.packing import pack_sequences

    rng = np.random.default_rng(3)
    docs = [rng.integers(0, 1000, rng.integers(1, 700)).astype(np.int32).tolist()
            for _ in range(200)]
    t = pa.table({"tokens": pa.array(docs, pa.list_(pa.int32())),
                  "n_tok": pa.array([len(d) for d in docs], pa.int32())})
    ds = ray.data.from_arrow(t)
    out = pack_sequences(ds, context_len=512).to_pandas()
    # every token preserved, in order within the block
    got = np.concatenate([np.asarray(x) for x in out["tokens"]])
    want = np.concatenate([np.asarray(d) for d in docs])
    np.testing.assert_array_equal(got, want)
    # all chunks full except the final remainder
    lens = out["n_tok"].to_numpy()
    assert (lens[:-1] == 512).all() and 0 < lens[-1] <= 512
    assert (out["tokens"].apply(len).to_numpy() == lens).all()


def test_embedding_quantization_roundtrip(emb):
    from parquet_hs_ray.pipelines.ann import dequantize_embeddings, quantize_embeddings

    q = quantize_embeddings(emb)
    back = dequantize_embeddings(q).to_pandas().sort_values("vec_id").reset_index(drop=True)
    raw = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    M0 = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    M1 = np.stack(back["embedding"].to_numpy()).astype(np.float64)
    assert M0.shape == M1.shape
    # int8 grid: relative error bounded by half a step of max|x|
    err = np.abs(M0 - M1).max(axis=1)
    bound = np.abs(M0).max(axis=1) / 127.0
    assert (err <= bound * 0.5 + 1e-12).all()
    # cosine neighborhoods survive quantization
    a = M0 / np.linalg.norm(M0, axis=1, keepdims=True)
    b = M1 / np.linalg.norm(M1, axis=1, keepdims=True)
    assert float((a * b).sum(axis=1).min()) > 0.995


def test_ivf_persisted_index_on_subtree_fs(emb, tmp_path):
    """The persisted IVF index works through an explicit pyarrow filesystem
    (VERDICT r2 #3): build and search with a SubTreeFileSystem and a
    ROOT-RELATIVE index path — local os.path/glob resolution would fail on
    it, so passing proves the index IO goes through state/fsio."""
    import numpy as np
    import pyarrow.fs as pafs

    from parquet_hs_ray.pipelines.ann import (
        ann_topk_bruteforce,
        ann_topk_ivf_indexed,
        ivf_build_index,
    )

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    C = ivf_build_index(emb, "ivf_fs", n_clusters=8, filesystem=fs)
    assert C.shape[0] == 8
    assert (tmp_path / "ivf_fs" / "centroids.json").exists()
    parts = [d.name for d in (tmp_path / "ivf_fs" / "data").iterdir()
             if d.name.startswith("cluster=")]
    assert 1 < len(parts) <= 8

    full = emb.to_pandas()
    qrow = full[full["vec_id"] == 0].iloc[0]
    qv = np.asarray([qrow["embedding"]], dtype=np.float64)

    exact = ann_topk_bruteforce(emb, query_ids=[0], k=10)
    got = ann_topk_ivf_indexed("ivf_fs", np.asarray([0]), qv, k=10, nprobe=8,
                               filesystem=fs)
    assert set(got["neighbor_id"]) == set(exact["neighbor_id"])
    assert got.attrs["clusters_read"] == len(parts)

    few = ann_topk_ivf_indexed("ivf_fs", np.asarray([0]), qv, k=10, nprobe=2,
                               filesystem=fs)
    assert few.attrs["clusters_read"] <= 2


def test_simhash_sql_oracle_parity(docs):
    """The generated DuckDB twin (sql_oracles.simhash_pairs_sql) must be
    bit-identical to the numpy kernel chain: signatures AND the final
    banding+hamming pairs (VERDICT r2 #2)."""
    import duckdb

    from parquet_hs_ray.functions import sketches as sk
    from parquet_hs_ray.functions.sql_oracles import simhash_pairs_sql, simhash_sig_sql
    from parquet_hs_ray.pipelines.dedup import dedup_simhash

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

    sig = con.execute(
        f"SELECT doc_id, simhash::UBIGINT AS simhash FROM ({simhash_sig_sql()}) ORDER BY doc_id"
    ).df()
    raw = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    n_sh, hashes = sk.char_shingle_hashes(raw["text"], k=5)
    ref_sig = sk.simhash64(n_sh, hashes).view(np.uint64)
    assert (sig["simhash"].to_numpy().astype(np.uint64) == ref_sig).all()

    ours = dedup_simhash(docs).reset_index(drop=True)
    sql = con.execute(simhash_pairs_sql()).df().astype(np.int64).reset_index(drop=True)
    pd.testing.assert_frame_equal(ours[["a", "b", "hamming"]], sql)


def test_quantize_sql_oracle_parity(emb):
    """emb_quantize / emb_dequantize SQL twins are bit-exact vs the int8
    kernels, including float32 boundary rounding and signed zeros
    (VERDICT r2 #6)."""
    import duckdb

    import __ray_entry__ as entrymod
    from parquet_hs_ray.pipelines.ann import dequantize_embeddings, quantize_embeddings

    o = entrymod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")

    qdf = (quantize_embeddings(emb).drop_columns(["codes"]).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    ref = con.execute(o["emb_quantize"]).df().sort_values("vec_id").reset_index(drop=True)
    assert (qdf["scale"].to_numpy(np.float32).view(np.int32)
            == ref["scale"].to_numpy(np.float32).view(np.int32)).all()
    assert (qdf["dim"].to_numpy() == ref["dim"].to_numpy()).all()

    dq = (dequantize_embeddings(quantize_embeddings(emb)).to_pandas()
          .sort_values("vec_id").reset_index(drop=True))
    dref = con.execute(o["emb_dequantize"]).df().sort_values("vec_id").reset_index(drop=True)
    a = np.stack(dq["embedding"].to_numpy()).astype(np.float32)
    b = np.stack(dref["embedding"].to_numpy()).astype(np.float32)
    assert (a.view(np.int32) == b.view(np.int32)).all()


def test_emb_neardup_bounded_task_grid(ray_session):
    """The exact block-pair near-dup must keep in-flight tasks under
    max_in_flight even with many blocks (VERDICT r2 #5), and still match a
    local brute-force reference exactly."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(7)
    n, d = 600, 16
    M = rng.normal(size=(n, d))
    # plant some near-dups
    M[100] = M[5] + rng.normal(scale=1e-3, size=d)
    M[200] = M[50] * 1.7
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32) for row in M],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    # rows_per_block=8 -> 75 blocks -> 2850 unordered block pairs
    out = embedding_neardup_pairs(ds, tau=0.95, rows_per_block=8, max_in_flight=16)
    assert out.attrs["peak_in_flight"] <= 16

    X = np.stack([np.asarray(r, dtype=np.float64) for r in tbl["embedding"].to_pylist()])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    S = Xn @ Xn.T
    ii, jj = np.nonzero(np.triu(S >= 0.95, k=1))
    ref = pd.DataFrame({"a": ii, "b": jj}).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(ref) >= 2  # the planted pairs
    pd.testing.assert_frame_equal(out[["a", "b"]].astype(np.int64), ref.astype(np.int64))


def test_minhash_sql_oracle_parity(docs):
    """The generated DuckDB twin of the FULL minhash-LSH pipeline (word
    hash chain -> shingles -> 64 perms -> banding -> Jaccard verify) must
    equal dedup_minhash exactly — pairs AND jaccard doubles."""
    import duckdb

    from parquet_hs_ray.functions.sql_oracles import minhash_pairs_sql
    from parquet_hs_ray.pipelines.dedup import dedup_minhash

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    ref = (con.execute(minhash_pairs_sql(threshold=0.8)).df()
           .astype({"a": np.int64, "b": np.int64, "jaccard": np.float64})
           .reset_index(drop=True))
    ours = dedup_minhash(docs, threshold=0.8)[["a", "b", "jaccard"]].reset_index(drop=True)
    assert len(ref) > 0
    pd.testing.assert_frame_equal(ours, ref)


def test_word_hashes_match_recursive_definition():
    """sketches.word_hashes' frontier vectorization must equal the naive
    per-word byte chain (the definition the SQL oracle implements)."""
    from parquet_hs_ray.functions.sketches import _splitmix64, word_hashes

    words = np.asarray(["a", "", "hello", "zz", "longer-word-here", "é"], dtype=object)
    got = word_hashes(words)
    for i, w in enumerate(words):
        h = np.zeros(1, dtype=np.uint64)
        for byte in w.encode("utf-8"):
            h = _splitmix64(h ^ np.uint64(byte))
        assert got[i] == h[0], w


def test_length_bucket_batches(ray_session):
    """Length-bucketed batching: blocking-independent, within-bucket ranks
    follow id order, batches hold at most batch_rows rows with dense pos."""
    import ray.data

    from parquet_hs_ray.pipelines.packing import length_bucket_batches

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"doc_id": [f"d{i:05d}" for i in range(997)],
                       "n_tok": rng.integers(1, 2000, 997)})
    outs = []
    for nb in (3, 11):
        ds = ray.data.from_pandas([df.iloc[i::nb].reset_index(drop=True)
                                   for i in range(nb)])
        out = (length_bucket_batches(ds, "doc_id", "n_tok",
                                     width=256, batch_rows=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # layout-independent

    out = outs[0]
    assert (out["bucket"].to_numpy()
            == df.sort_values("doc_id")["n_tok"].to_numpy() // 256).all()
    for (_, _), g in out.groupby(["bucket", "batch_id"]):
        assert len(g) <= 8
        assert sorted(g["pos"]) == list(range(len(g)))
    # rank order within bucket == id order
    for _, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        ranks = (g["batch_id"] * 8 + g["pos"]).to_numpy()
        assert (ranks == np.arange(len(g))).all()


def test_pack_sequences_global_blocking_independent(ray_session):
    """pack_sequences_global is a pure function of the data: identical
    output for any input blocking, equal to the locally computed
    concat-and-chunk stream in doc_id order (incl. a non-power-of-two
    context length and the partial final sequence)."""
    import ray.data

    from parquet_hs_ray.pipelines.packing import pack_sequences_global
    from parquet_hs_ray.sources.synth import cached_dataset

    src = cached_dataset(500, seed=7, n_files=3)
    raw = pd.read_parquet(src).sort_values("doc_id")
    stream = np.concatenate([np.asarray(x, dtype=np.int32) for x in raw["tokens"]])
    L = 777
    n_seq = -(-len(stream) // L)

    outs = []
    for nb in (1, 5):
        ds = ray.data.read_parquet(src, override_num_blocks=nb)
        out = (pack_sequences_global(ds, context_len=L).to_pandas()
               .sort_values("seq_id").reset_index(drop=True))
        assert len(out) == n_seq
        for k in range(n_seq):
            assert np.array_equal(np.asarray(out["tokens"][k], np.int32),
                                  stream[k * L:(k + 1) * L]), (nb, k)
        assert int(out["n_tok"].iloc[-1]) == len(stream) - (n_seq - 1) * L
        outs.append(out)
    # byte-identical across blockings
    assert outs[0]["seq_id"].equals(outs[1]["seq_id"])
    assert (outs[0]["n_tok"].to_numpy() == outs[1]["n_tok"].to_numpy()).all()


def _ref_png_filter(img, filters):
    """Independent per-pixel implementation of PNG scanline filtering
    (the ENCODER direction, per the spec) used to build wire bytes that
    decode_png must invert."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    out = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = filters[y]
        line = np.empty(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) % 256
        out.append(bytes([f]) + bytes(line.astype(np.uint8)))
        prev = cur
    return b"".join(out)


def test_png_codec_roundtrip_and_all_filters():
    """encode_png -> decode_png is lossless for gray/RGB/RGBA; decode_png
    inverts ALL five scanline filters against an independent per-pixel
    filter implementation."""
    import struct
    import zlib

    from parquet_hs_ray.stages.media_codecs import _PNG_SIG, _chunk, decode_png, encode_png

    rng = np.random.default_rng(3)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert np.array_equal(back, img), ch

    # every filter type on one image, wire bytes built independently
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4]
    raw = _ref_png_filter(img, filters)
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0)
    data = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)


def test_wav_codec_and_resize():
    from parquet_hs_ray.stages.media_codecs import (
        decode_wav,
        encode_wav,
        resize_nearest,
    )

    t = np.arange(800)
    pcm = np.stack([(10000 * np.sin(t / 20)).astype(np.int16),
                    (8000 * np.cos(t / 15)).astype(np.int16)], axis=1)
    back, rate = decode_wav(encode_wav(pcm, 16000))
    assert rate == 16000 and np.array_equal(back, pcm)

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    small = resize_nearest(img, 2, 3)
    assert small.shape == (3, 2, 3)
    ys = np.minimum((np.arange(3) * 5) // 3, 4)
    xs = np.minimum((np.arange(2) * 4) // 2, 3)
    assert np.array_equal(small, img[ys][:, xs])


def test_media_stages_real_decode(ray_session):
    """decode_real=True actually decodes: PNG features match direct
    computation, resize output re-decodes to the nearest-neighbor result,
    WAV frame sampling conserves every PCM sample, and unsupported
    formats raise (not silently fake)."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.stages.media_codecs import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
        image_features,
        resize_nearest,
    )
    from parquet_hs_ray.stages.multimodal import (
        FrameSampleStage,
        ImageResizeStage,
        MediaFeatureStage,
    )

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, size=(16 + i, 12, 3), dtype=np.uint8) for i in range(4)]
    wavs = [(6000 * np.sin(np.arange(400 + 37 * i) / (3 + i))).astype(np.int16)[:, None]
            for i in range(3)]
    payloads = [encode_png(im) for im in imgs] + [encode_wav(w, 8000) for w in wavs]
    t = pa.table({"media_id": pa.array(range(len(payloads)), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    ds = ray.data.from_arrow(t)

    feats = (ds.map_batches(MediaFeatureStage,
                            fn_constructor_kwargs={"decode_real": True},
                            batch_size=4, concurrency=2, batch_format="pyarrow")
             .to_pandas().sort_values("media_id").reset_index(drop=True))
    f0 = np.asarray(feats["features"][0], np.float32)
    ref0 = image_features(imgs[0], len(payloads[0]))
    assert np.allclose(f0, ref0)
    assert (np.stack(feats["features"].to_numpy())[:, 1] ==
            np.asarray([1, 1, 1, 1, 2, 2, 2], np.float32)).all()  # kinds

    # real resize: output PNG decodes to the nearest-neighbor reference
    imgs_ds = ray.data.from_arrow(t.slice(0, 4))
    res = (imgs_ds.map_batches(ImageResizeStage,
                               fn_constructor_kwargs={"width": 8, "height": 6,
                                                      "decode_real": True},
                               batch_size=2, concurrency=2, batch_format="pyarrow")
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    for i in range(4):
        got = decode_png(res["payload"][i])
        assert np.array_equal(got, resize_nearest(imgs[i], 8, 6))

    # real temporal sampling: concat of frame PCM == original PCM
    wav_ds = ray.data.from_arrow(t.slice(4, 3))
    fr = (wav_ds.map_batches(FrameSampleStage,
                             fn_constructor_kwargs={"n_frames": 4, "decode_real": True},
                             batch_size=2, concurrency=2, batch_format="pyarrow")
          .to_pandas().sort_values(["media_id", "frame_index"]).reset_index(drop=True))
    assert len(fr) == 3 * 4
    for i, w in enumerate(wavs):
        segs = [decode_wav(fr["frame"][j])[0]
                for j in range(len(fr)) if fr["media_id"][j] == 4 + i]
        assert np.array_equal(np.concatenate(segs), w)

    # unsupported format fails loudly
    bad = pa.table({"media_id": pa.array([0], pa.int64()),
                    "payload": pa.array([b"\xff\xd8\xffJPEGDATA"], pa.binary())})
    with pytest.raises(Exception, match="NotImplemented|external codec|format"):
        ray.data.from_arrow(bad).map_batches(
            MediaFeatureStage, fn_constructor_kwargs={"decode_real": True},
            concurrency=1, batch_format="pyarrow").to_pandas()


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """Distributed as-of join == pandas merge_asof (backward, exact
    matches allowed) with many sort blocks, so boundary-key carries are
    exercised; includes left keys with no right rows at all."""
    import pyarrow.compute as pc
    import ray.data

    from parquet_hs_ray.pipelines.joins import asof_join

    ev = ray.data.read_parquet(f"{SF}/events.parquet", override_num_blocks=16)
    left = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
                          batch_format="pyarrow")
    right = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "click")),
                           batch_format="pyarrow")
    ours = (asof_join(left, right, key="user_id", ts="ts",
                      left_cols=("event_id",), right_cols=("event_id", "value"))
            .to_pandas()
            .sort_values(["user_id", "ts", "event_id"], kind="stable")
            .reset_index(drop=True))

    raw = pd.read_parquet(f"{SF}/events.parquet")
    lp = (raw[raw.event_type == "purchase"][["user_id", "ts", "event_id"]]
          .sort_values(["ts", "event_id"], kind="stable"))
    rp = (raw[raw.event_type == "click"][["user_id", "ts", "event_id", "value"]]
          .sort_values(["ts", "event_id"], kind="stable")
          .rename(columns={"event_id": "matched_event_id", "value": "matched_value"}))
    ref = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward",
                        allow_exact_matches=True)
    ref = (ref.sort_values(["user_id", "ts", "event_id"], kind="stable")
           .reset_index(drop=True)[ours.columns.tolist()])
    pd.testing.assert_frame_equal(ours, ref, check_dtype=False)
    assert ours["matched_event_id"].isna().any()  # some purchases precede any click


def test_dedup_clusters_transitive(docs):
    """Connected components: a chain a-b, b-c (no direct a-c pair) must
    land in ONE cluster labeled min(id); isolated docs are singletons.
    Checked against a BFS reference over the same pair graph."""
    from collections import deque

    from parquet_hs_ray.pipelines.dedup import dedup_clusters, dedup_minhash

    pairs = dedup_minhash(docs, threshold=0.8)
    got = (dedup_clusters(docs, pairs=pairs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # BFS reference
    adj: dict = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label: dict = {}
    for start in sorted(adj):
        if start in label:
            continue
        comp, q = [], deque([start])
        seen = {start}
        while q:
            x = q.popleft()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        root = min(comp)
        for x in comp:
            label[x] = root
    expect = got["doc_id"].map(lambda d: label.get(d, d))
    assert (got["cluster_id"] == expect).all()
    # sanity: at least one real multi-doc cluster exists in the corpus
    assert (got["cluster_id"] != got["doc_id"]).any()

    # synthetic chain: a-b and b-c pairs only -> one cluster
    chain = pd.DataFrame({"a": [10, 20], "b": [20, 30], "jaccard": [0.9, 0.9]})
    import pyarrow as pa
    import ray.data

    tiny = ray.data.from_arrow(pa.table({"doc_id": pa.array([5, 10, 20, 30], pa.int64())}))
    out = (dedup_clusters(tiny, pairs=chain).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["cluster_id"].tolist() == [5, 10, 10, 10]


def test_dedup_jaccard_exact_allpairs(docs):
    """Standalone exact n-gram Jaccard: matches a local brute-force over
    the same sketch sets, is a superset-of-or-equal to LSH recall, and is
    invariant to blocking (block-pair decomposition)."""
    from parquet_hs_ray.functions import sketches as sk
    from parquet_hs_ray.pipelines.dedup import dedup_jaccard, dedup_minhash

    got = dedup_jaccard(docs, threshold=0.8)
    # local reference
    raw = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    n_sh, hashes = sk.word_ngram_hashes(raw["text"], n=3)
    offs = np.concatenate([[0], np.cumsum(n_sh)])
    sets = [np.unique(hashes[offs[i]:offs[i + 1]]) for i in range(len(raw))]
    ids = raw["doc_id"].to_numpy()
    exp = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[i], sets[j]
            if len(a) == 0 and len(b) == 0:
                jac = 1.0
            else:
                inter = len(np.intersect1d(a, b, assume_unique=True))
                jac = inter / (len(a) + len(b) - inter)
            if jac >= 0.8:
                exp.append((min(ids[i], ids[j]), max(ids[i], ids[j]), jac))
    exp = pd.DataFrame(exp, columns=["a", "b", "jaccard"]).sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype({"a": np.int64, "b": np.int64}))

    # LSH output must be a subset (here: equal recall or less)
    lsh = dedup_minhash(docs, threshold=0.8)
    lset = set(zip(lsh["a"], lsh["b"]))
    gset = set(zip(got["a"], got["b"]))
    assert lset <= gset

    # blocking invariance
    small = dedup_jaccard(docs, threshold=0.8, rows_per_block=7)
    pd.testing.assert_frame_equal(small, got)


def test_range_join_matches_pandas(ray_session):
    """range_join == local per-user window scan, with 16 sort blocks so
    window-bounded boundary carries are exercised; duplicate right events
    at identical ts must appear once per occurrence (no dedup)."""
    import pyarrow.compute as pc
    import ray.data

    from parquet_hs_ray.pipelines.joins import range_join

    ev = ray.data.read_parquet(f"{SF}/events.parquet", override_num_blocks=16)
    W = 7_200_000_000
    left = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
                          batch_format="pyarrow")
    right = ev.map_batches(lambda t: t.filter(pc.equal(t["event_type"], "view")),
                           batch_format="pyarrow")
    ours = (range_join(left, right, window_us=W,
                       left_cols=("event_id",), right_cols=("event_id",))
            .to_pandas()
            .sort_values(["user_id", "ts", "event_id", "matched_ts"],
                         kind="stable")
            .reset_index(drop=True))

    raw = pd.read_parquet(f"{SF}/events.parquet")
    lp = raw[raw.event_type == "purchase"]
    rp = raw[raw.event_type == "view"]
    rows = []
    for _, l in lp.iterrows():
        cand = rp[(rp.user_id == l.user_id) & (rp.ts <= l.ts)
                  & (rp.ts >= l.ts - pd.Timedelta(microseconds=W))]
        for _, r in cand.iterrows():
            rows.append((l.user_id, l.ts, l.event_id, r.event_id, r.ts))
    ref = (pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                       "matched_event_id", "matched_ts"])
           .sort_values(["user_id", "ts", "event_id", "matched_ts"], kind="stable")
           .reset_index(drop=True))
    assert len(ref) > 0
    ref = ref.astype({"ts": "datetime64[us]", "matched_ts": "datetime64[us]"})
    pd.testing.assert_frame_equal(ours, ref[ours.columns.tolist()])


def test_running_totals_matches_pandas_across_blocks(ray_session):
    """Running per-key totals equal a pandas groupby cumsum twin even
    when one hot key straddles many sort blocks (carry-fold path)."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import running_totals

    rng = np.random.default_rng(23)
    n = 6000
    df = pd.DataFrame({
        # one hot user (~half the rows) guarantees multi-block straddle
        "user_id": np.where(rng.random(n) < 0.5, 7, rng.integers(0, 40, n)),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.uniform(-100, 100, n), 3),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 250] for i in range(0, n, 250)])
    out = (running_totals(ds).to_pandas()
           .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
           .reset_index(drop=True))

    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    cents = np.round(ref["value"].to_numpy() * 100.0).astype(np.int64)
    g = ref.groupby("user_id", sort=False)
    ref["running_n"] = g.cumcount().to_numpy() + 1
    ref["running_cents"] = pd.Series(cents).groupby(ref["user_id"]).cumsum()
    ref = ref.drop(columns=["value"])
    pd.testing.assert_frame_equal(out, ref[out.columns.tolist()])


def test_running_totals_empty(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.windows import running_totals

    df = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                       "ts": pd.Series(dtype="datetime64[us]"),
                       "event_id": pd.Series(dtype=np.int64),
                       "value": pd.Series(dtype=np.float64)})
    out = running_totals(ray.data.from_pandas(df))
    assert out.count() == 0
    # Ray's to_pandas drops columns on zero-row datasets; the schema is
    # the contract
    assert out.schema().names == ["user_id", "ts", "event_id",
                                  "running_n", "running_cents"]


def test_top_ngrams_no_cross_document_grams(ray_session):
    """Bigrams never span documents; counts match a pure-python twin."""
    import collections

    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import top_ngrams

    docs = ["the cat sat", "sat the cat", "the cat", "x"]
    df = pd.DataFrame({"doc_id": range(4), "text": docs})
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])
    out = top_ngrams(ds, n=2, k=10)

    exp = collections.Counter()
    for t in docs:
        ws = t.split()
        exp.update(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(map(tuple, out.itertuples(index=False))) == ranked
    # "cat sat the" style cross-doc grams must not exist
    assert "sat x" not in out["gram"].tolist()


def test_top_ngrams_n_exceeds_all_docs(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import top_ngrams

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b"]}))
    out = top_ngrams(ds, n=5, k=3)
    assert len(out) == 0 and list(out.columns) == ["gram", "n"]
    with pytest.raises(ValueError):
        top_ngrams(ds, n=0)


def test_kmeans_refine_distributed_monotone_and_recovers_clusters(ray_session):
    """Full-corpus Lloyd refinement: mean cosine similarity is
    non-decreasing per iteration (spherical-Lloyd invariant) and
    deliberately-perturbed centroids snap back to planted clusters."""
    import ray.data

    from parquet_hs_ray.pipelines.ann import kmeans_refine_distributed

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, 250, axis=0) + rng.normal(scale=0.05, size=(1000, 16))
    df = pd.DataFrame({"vec_id": np.arange(1000),
                       "embedding": list(X.astype(np.float64))})
    ds = ray.data.from_pandas([df.iloc[i:i + 100] for i in range(0, 1000, 100)])

    # start from the true centers nudged hard off-axis
    C0 = centers + rng.normal(scale=0.15, size=centers.shape)
    C0 /= np.linalg.norm(C0, axis=1, keepdims=True)
    C, hist = kmeans_refine_distributed(ds, C0, iters=5)

    assert len(hist) == 5
    assert all(b >= a - 1e-12 for a, b in zip(hist, hist[1:])), hist
    # every refined centroid aligns with exactly one planted center
    sims = C @ centers.T
    assert (sims.max(axis=1) > 0.99).all()
    assert sorted(sims.argmax(axis=1).tolist()) == [0, 1, 2, 3]


def test_ivf_build_index_with_refinement(emb, tmp_path, ray_session):
    """refine_iters>0 threads through ivf_build_index and still yields a
    searchable index with sane recall."""
    from parquet_hs_ray.pipelines.ann import (ann_topk_bruteforce,
                                              ann_topk_ivf_indexed,
                                              ivf_build_index)

    idx = str(tmp_path / "ivf_refined")
    ivf_build_index(emb, idx, n_clusters=8, refine_iters=2)
    full = emb.to_pandas()
    qids = np.array([0, 1], dtype=np.int64)
    qv = np.stack(full[full["vec_id"].isin(qids)].sort_values("vec_id")
                  ["embedding"].to_numpy()).astype(np.float64)
    exact = ann_topk_bruteforce(emb, query_ids=[0, 1], k=5)
    approx = ann_topk_ivf_indexed(idx, qids, qv, k=5, nprobe=4)
    hit = 0
    for q in (0, 1):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hit += len(e & a)
    assert hit >= 5  # >=50% recall at nprobe=4/8 on the tiny corpus


def test_deterministic_shuffle_reproducible_and_layout_independent(ray_session):
    """Same seed -> identical ranks across different block layouts; ranks
    are a permutation of 1..n; different seed -> different order."""
    import hashlib

    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    def run(ds, seed):
        return (deterministic_shuffle(ds, "doc_id", seed=seed).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    a = run(ray.data.from_pandas([df.iloc[i:i + 50] for i in range(0, 500, 50)]), 42)
    b = run(ray.data.from_pandas([df.iloc[:333], df.iloc[333:]]), 42)
    pd.testing.assert_frame_equal(a, b)
    assert sorted(a["shuffle_rank"].tolist()) == list(range(1, 501))
    # matches the reference md5 order
    keys = [hashlib.md5(f"42:{i}".encode()).hexdigest() for i in range(500)]
    exp_rank = np.argsort(np.argsort(np.asarray(keys, dtype=object))) + 1
    assert a["shuffle_rank"].tolist() == exp_rank.tolist()
    c = run(ray.data.from_pandas(df), 7)
    assert c["shuffle_rank"].tolist() != a["shuffle_rank"].tolist()


def test_event_gaps_matches_pandas_across_blocks(ray_session):
    """lag() gaps equal a pandas groupby-shift twin with a hot key
    straddling blocks; first event per key carries the -1 sentinel."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import event_gaps

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "user_id": np.where(rng.random(n) < 0.5, 3, rng.integers(0, 30, n)),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.uniform(0, 1, n),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 200] for i in range(0, n, 200)])
    out = (event_gaps(ds).to_pandas()
           .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
           .reset_index(drop=True))

    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    us = ref["ts"].astype("datetime64[us]").astype("int64")
    prev = us.groupby(ref["user_id"]).shift(1)
    ref["gap_us"] = (us - prev).fillna(-1).astype(np.int64)
    ref = ref.drop(columns=["value"])
    pd.testing.assert_frame_equal(out, ref[out.columns.tolist()],
                                  check_dtype=False)


def test_ntile_bucket_sql_distribution(ray_session):
    """Bucket sizes follow the SQL NTILE rule (first T%n buckets one
    larger); ordering by (value, id) decides membership; n > rows."""
    import ray.data

    from parquet_hs_ray.pipelines.stats import ntile_bucket

    rng = np.random.default_rng(41)
    df = pd.DataFrame({"event_id": np.arange(1003, dtype=np.int64),
                       "value": rng.integers(0, 40, 1003).astype(np.float64)})
    ds = ray.data.from_pandas([df.iloc[i:i + 100] for i in range(0, 1003, 100)])
    out = ntile_bucket(ds, "value", 8, "event_id").to_pandas()
    sizes = out["bucket"].value_counts().sort_index()
    # 1003 = 8*125 + 3: first 3 buckets get 126
    assert sizes.tolist() == [126, 126, 126] + [125] * 5
    # bucket order respects (value, id) order
    srt = out.sort_values(["value", "event_id"])
    assert (np.diff(srt["bucket"].to_numpy()) >= 0).all()

    tiny = ntile_bucket(
        ray.data.from_pandas(df.iloc[:3]), "value", 8, "event_id").to_pandas()
    assert sorted(tiny["bucket"].tolist()) == [1, 2, 3]


def test_embedding_pca_matches_numpy(ray_session):
    """Distributed two-pass PCA equals a numpy PCA on the gathered data
    (same covariance, eigenvalues, canonical-sign projections)."""
    import ray.data

    from parquet_hs_ray.pipelines.ann import embedding_pca

    rng = np.random.default_rng(17)
    # anisotropic cloud: variance concentrated in 3 planted directions
    B = rng.normal(size=(3, 12)) * np.array([[6.0], [3.0], [1.5]])
    X = rng.normal(size=(800, 3)) @ B + rng.normal(scale=0.1, size=(800, 12))
    df = pd.DataFrame({"vec_id": np.arange(800),
                       "embedding": list(X.astype(np.float64))})
    ds = ray.data.from_pandas([df.iloc[i:i + 100] for i in range(0, 800, 100)])
    proj, info = embedding_pca(ds, k=3)
    out = proj.to_pandas().sort_values("vec_id").reset_index(drop=True)
    P = np.stack(out["pca"].to_numpy())

    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(3), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    np.testing.assert_allclose(info["eigenvalues"], evals[order], rtol=1e-8)
    np.testing.assert_allclose(P, (X - mu) @ comps.T, atol=1e-7)
    # 3 planted directions must explain nearly all variance
    assert info["explained_variance_ratio"].sum() > 0.99


def test_sample_weighted_deterministic_and_saturating(ray_session):
    """Keep probability is weight-proportional (integer-exact rule
    h // T < w): zero-weight rows never survive, weights >= 1/rate always
    survive, the kept set is reproducible, and the kept fraction of
    mid-weight rows tracks w * rate."""
    import numpy as np
    import pandas as pd
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import sample_weighted

    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": "s",
        # thirds: weight 0 (never), 2000 (p=0.5), 10**9 (always)
        "n_chars": np.where(np.arange(n) % 3 == 0, 0,
                            np.where(np.arange(n) % 3 == 1, 2000, 10**9)),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 500] for i in range(0, n, 500)])
    out = sample_weighted(ds, "n_chars", rate_per_unit=1 / 4000, seed=7).to_pandas()
    w = out.set_index("doc_id")["n_chars"]
    assert (w > 0).all()                       # zero-weight never kept
    n_always = int((df["n_chars"] == 10**9).sum())
    assert int((w == 10**9).sum()) == n_always  # saturated: all kept
    frac_mid = (w == 2000).sum() / (df["n_chars"] == 2000).sum()
    assert 0.40 < frac_mid < 0.60               # p = 0.5 +- noise
    out2 = sample_weighted(ds, "n_chars", rate_per_unit=1 / 4000, seed=7).to_pandas()
    pd.testing.assert_frame_equal(out.sort_values("doc_id").reset_index(drop=True),
                                  out2.sort_values("doc_id").reset_index(drop=True))
    # different seed: different (but same-law) selection
    out3 = sample_weighted(ds, "n_chars", rate_per_unit=1 / 4000, seed=8).to_pandas()
    assert set(out3["doc_id"]) != set(out["doc_id"])

    # float weight column: explicit floor (0.9 -> 0, never kept; 2000.7
    # behaves as 2000) — the same rule the SQL twin's floor() applies
    dff = df.assign(n_chars=df["n_chars"].astype(float) + 0.7)
    dff.loc[dff["n_chars"] == 0.7, "n_chars"] = 0.9
    dsf = ray.data.from_pandas([dff.iloc[i:i + 500] for i in range(0, n, 500)])
    outf = sample_weighted(dsf, "n_chars", rate_per_unit=1 / 4000, seed=7).to_pandas()
    assert (outf["n_chars"] > 1).all()  # sub-1 fractional weights never kept
    kept_mid = set(outf[outf["n_chars"] == 2000.7]["doc_id"])
    assert kept_mid == set(out[out["n_chars"] == 2000]["doc_id"])  # floor == int run


def test_ann_topk_quantized_recall(emb):
    """int8-code search recalls nearly all exact neighbors (the grid only
    perturbs sims by ~1/254 per axis) and never returns a self-match."""
    from parquet_hs_ray.pipelines.ann import ann_topk_bruteforce, ann_topk_quantized

    exact = ann_topk_bruteforce(emb, query_ids=[0, 1], k=10)
    quant = ann_topk_quantized(emb, query_ids=[0, 1], k=10)
    assert len(quant) == len(exact) == 20
    assert not (quant["query_id"] == quant["neighbor_id"]).any()
    for qid in (0, 1):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(quant[quant["query_id"] == qid]["neighbor_id"])
        assert len(e & a) >= 8, (qid, e, a)  # >= 0.8 recall per query


def test_sample_weighted_float_extremes_match_sql_twin(ray_session):
    """Kernel vs the DuckDB twin on a float weight column with NaN, +inf,
    >=2^64, fractional and zero weights — the exact value set that
    previously diverged (numpy uint64 cast of inf -> 0; SQL NaN::HUGEINT
    raised)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from parquet_hs_ray.functions.sql_oracles import weighted_sample_sql
    from parquet_hs_ray.pipelines.text_analysis import sample_weighted

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "source": "s",
        "n_chars": [0.0, 0.9, 1.0, 2000.7, float("nan"), float("inf"),
                    1e20, 2.0**63, -5.0, 123.0],
    })
    ds = ray.data.from_pandas([df.iloc[:5], df.iloc[5:]])
    ours = (sample_weighted(ds, "n_chars", rate_per_unit=1 / 4000, seed=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    sql = weighted_sample_sql("documents", "n_chars", rate_per_unit=1 / 4000, seed=7)
    ref = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    assert ours["doc_id"].tolist() == ref["doc_id"].tolist(), (ours, ref)
    # saturation: inf / 1e20 / 2^63 weights must all be kept
    kept = set(ours["doc_id"])
    assert {5, 6, 7} <= kept
    # NaN, negative, zero and sub-1 fractional weights never kept
    assert not ({0, 1, 4, 8} & kept)


def test_retention_cohorts_cross_block_duplicates(ray_session):
    """A user active in the same week across DIFFERENT blocks must count
    once per (cohort, age) cell; cohort = first active week."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import retention_cohorts

    wk = 7 * 86400 * 1_000_000
    t = lambda w, off=0: pd.Timestamp(w * wk + off, unit="us")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 1],
        "ts": [t(2800), t(2800, 5), t(2802), t(2801), t(2802), t(2800, 9)],
    })
    # user 1's week-2800 events split across three blocks
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:5], df.iloc[5:]])
    out = (retention_cohorts(ds).to_pandas()
           .sort_values(["cohort_week", "age"]).reset_index(drop=True))
    ref = pd.DataFrame({"cohort_week": [2800, 2800, 2801, 2801],
                        "age": [0, 2, 0, 1], "n_users": [1, 1, 1, 1]})
    pd.testing.assert_frame_equal(
        out.astype({"cohort_week": np.int64, "age": np.int64,
                    "n_users": np.int64}), ref.astype(np.int64))


def test_assign_splits_partition_and_determinism(docs):
    """Every row gets exactly one split; assignment is a pure function of
    the id (layout-independent); fractions land near the targets."""
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import assign_splits

    pcts = {"train": 80, "val": 10, "test": 10}
    a = (assign_splits(docs, pcts).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    ds2 = ray.data.read_parquet(f"{SF}/documents.parquet", override_num_blocks=9)
    b = (assign_splits(ds2, pcts).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    counts = a["split"].value_counts()
    assert set(counts.index) <= set(pcts)
    assert counts.sum() == len(a)
    assert abs(counts.get("train", 0) / len(a) - 0.8) < 0.08
    with pytest.raises(ValueError):
        assign_splits(docs, {"train": 90, "val": 5})


def test_calendar_rollup_units_match_pandas(ray_session):
    """day/week/month buckets equal a pandas recompute (week = Monday
    start, DuckDB's date_trunc convention); cents are exact."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import calendar_rollup

    rng = np.random.default_rng(3)
    n = 2000
    ts = pd.Timestamp("2026-01-15") + pd.to_timedelta(
        rng.integers(0, 90 * 86400, n), unit="s")
    df = pd.DataFrame({"ts": ts, "event_type": rng.choice(["a", "b"], n),
                       "value": np.round(rng.uniform(-5, 5, n), 3)})
    ds = ray.data.from_pandas([df.iloc[i::6].reset_index(drop=True)
                               for i in range(6)])
    for unit, f in [("day", lambda t: t.dt.floor("D")),
                    ("week", lambda t: t.dt.to_period("W-SUN").dt.start_time),
                    ("month", lambda t: t.dt.to_period("M").dt.start_time)]:
        out = (calendar_rollup(ds, unit=unit).to_pandas()
               .sort_values(["bucket", "event_type"]).reset_index(drop=True))
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        ref = (pd.DataFrame({"bucket": f(df["ts"]), "event_type": df["event_type"],
                             "n": np.int64(1), "value_cents": cents})
               .groupby(["bucket", "event_type"], as_index=False).sum()
               .sort_values(["bucket", "event_type"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            out.astype({"n": np.int64, "value_cents": np.int64}), ref, check_dtype=False)
        if unit == "week":
            assert (out["bucket"].dt.dayofweek == 0).all()  # Monday start


def test_event_transitions_cross_block_junction(ray_session):
    """Transition counts must pair a user's last event of one block with
    their first event of the next (junction carry), never pair across
    users, and match a pandas lead() recompute on adversarial blocking."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import event_transitions

    rng = np.random.default_rng(21)
    n = 1200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n),
        "ts": pd.Timestamp("2026-02-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    ds = ray.data.from_pandas([df.iloc[i::11].reset_index(drop=True)
                               for i in range(11)])
    out = (event_transitions(ds).to_pandas()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    nxt = s.groupby("user_id")["event_type"].shift(-1)
    ref = (pd.DataFrame({"prev_type": s["event_type"], "next_type": nxt})
           .dropna().groupby(["prev_type", "next_type"]).size()
           .reset_index(name="n").astype({"n": np.int64})
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype({"n": np.int64}), ref)
    assert out["n"].sum() == len(df) - df["user_id"].nunique()


def test_sample_exact_n_layout_independent(docs):
    """Exactly n rows, identical across block layouts, matching a full
    driver-side hash sort; n >= corpus returns everything."""
    import hashlib

    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import sample_exact_n

    a = sample_exact_n(docs, n=50, seed=7, columns=["doc_id", "source"])
    ds2 = ray.data.read_parquet(f"{SF}/documents.parquet",
                                override_num_blocks=13)
    b = sample_exact_n(ds2, n=50, seed=7, columns=["doc_id", "source"])
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 50

    raw = docs.to_pandas()
    h = raw["doc_id"].map(lambda v: hashlib.md5(f"7:{v}".encode()).hexdigest())
    ref_ids = (raw.assign(_h=h).sort_values(["_h", "doc_id"])
               .head(50)["doc_id"].tolist())
    assert a["doc_id"].tolist() == ref_ids

    big = sample_exact_n(docs, n=10**6, seed=7, columns=["doc_id"])
    assert len(big) == len(raw)


def test_label_centroids_matches_numpy(emb):
    """Centroids equal a numpy recompute through the same micro-unit
    quantization, regardless of blocking."""
    import ray.data

    from parquet_hs_ray.pipelines.ann import label_centroids

    out = label_centroids(emb).set_index("label")
    raw = emb.to_pandas()
    M = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    q = np.round(M * 1e6).astype(np.int64)
    for lab, g in raw.groupby("label"):
        idx = g.index.to_numpy()
        ref = (q[idx].sum(axis=0).astype(np.float64) / 1e6) / float(len(idx))
        got = np.asarray(out.loc[lab, "centroid"], dtype=np.float64)
        assert np.array_equal(got, ref), lab
        assert out.loc[lab, "n"] == len(idx)
    # layout independence
    df = raw.sample(frac=1.0, random_state=1).reset_index(drop=True)
    ds2 = ray.data.from_pandas([df.iloc[i::7].reset_index(drop=True)
                                for i in range(7)])
    out2 = label_centroids(ds2).set_index("label")
    for lab in out.index:
        assert np.array_equal(np.asarray(out.loc[lab, "centroid"]),
                              np.asarray(out2.loc[lab, "centroid"]))


def test_embedding_clusters_srp_planted(emb):
    """Planted jittered duplicates land in their source's cluster
    (cluster_id = min vec_id of the component); untouched vectors stay
    singletons of themselves."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import embedding_clusters_srp

    raw = emb.to_pandas()
    planted = raw.head(10).copy()
    J = np.stack(planted["embedding"].to_numpy()).astype(np.float64)
    planted["vec_id"] = planted["vec_id"] + 1_000_000
    planted["embedding"] = list((J + 0.05 * np.roll(J, 1, axis=1))
                                .astype(np.float32))
    aug = pd.concat([raw, planted]).reset_index(drop=True)
    ds = ray.data.from_pandas([aug.iloc[i::4].reset_index(drop=True)
                               for i in range(4)])
    out = (embedding_clusters_srp(ds, tau=0.9).to_pandas()
           .set_index("vec_id"))
    for i in range(10):
        assert out.loc[i + 1_000_000, "cluster_id"] == out.loc[i, "cluster_id"]
    # most originals are their own cluster roots
    roots = (out.index == out["cluster_id"]).sum()
    assert roots >= len(raw) - 10


def test_rolling_mean_cross_block_carry(ray_session):
    """Rolling last-k mean: the first rows of a block must see the
    previous block's tail (k-row carry, incl. a user spanning 3 blocks);
    matches a pandas groupby-rolling recompute on adversarial blocking."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import rolling_mean

    rng = np.random.default_rng(8)
    n = 900
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.sort(rng.integers(0, 5, n)),  # long per-user runs
        "ts": pd.Timestamp("2026-03-01")
        + pd.to_timedelta(np.arange(n), unit="s"),
        "value": np.round(rng.uniform(-9, 9, n), 3),
    })
    # 15 narrow blocks: every user spans several consecutive blocks
    ds = ray.data.from_pandas([df.iloc[i * 60:(i + 1) * 60] for i in range(15)])
    out = (rolling_mean(ds, k=3).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    cents = pd.Series(np.round(df["value"].to_numpy() * 100.0).astype(np.int64))
    g = cents.groupby(df["user_id"]).rolling(3, min_periods=1)
    ref = (g.sum().reset_index(drop=True).to_numpy()
           / g.count().reset_index(drop=True).to_numpy())
    assert np.array_equal(out["rolling_mean_cents"].to_numpy(), ref)


def test_grouped_stddev_matches_numpy(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.stats import grouped_stddev

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": rng.choice(["x", "y"], 500),
                       "value": np.round(rng.uniform(-5, 5, 500), 3)})
    df.loc[df.index[:1], "k"] = "solo1"
    ds = ray.data.from_pandas([df.iloc[i::5].reset_index(drop=True)
                               for i in range(5)])
    out = grouped_stddev(ds, "k", "value").to_pandas().set_index("k")
    assert "solo1" not in out.index or out.loc["solo1", "n"] > 1
    for k in ("x", "y"):
        v = np.round(df[df["k"] == k]["value"].to_numpy() * 100.0)
        assert abs(out.loc[k, "var_cents2"] - v.var(ddof=1)) < 1e-6
        assert out.loc[k, "std_cents"] == np.sqrt(out.loc[k, "var_cents2"])


def test_curate_by_surprisal_band_and_splits(docs):
    """Recipe v2: survivors are exactly the docs whose mean surprisal
    sits in the band (integer cross-multiplication, no division), every
    survivor carries a valid split, zero-word docs never pass."""
    from collections import Counter

    from parquet_hs_ray.pipelines.recipes import curate_by_surprisal

    out = (curate_by_surprisal(docs, lo_milli=4015, hi_milli=4060)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    raw = docs.to_pandas()
    words = raw["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    freq = Counter(w for ws in words for w in ws)
    n, v = sum(freq.values()), len(freq)
    smap = {w: ((n + v) // (c + 1)).bit_length() - 1 for w, c in freq.items()}
    keep = []
    for did, ws in zip(raw["doc_id"], words):
        nw, ss = len(ws), sum(smap[w] for w in ws)
        if nw > 0 and 4015 * nw <= 1000 * ss <= 4060 * nw:
            keep.append(did)
    assert out["doc_id"].tolist() == sorted(keep)
    assert 0 < len(out) < len(raw)
    assert set(out["split"]) <= {"train", "val", "test"}


def test_review_fix_edge_cases(ray_session):
    """Session review fixes: empty sorted blocks in length_bucket_batches,
    NULL values in rolling_mean, sample_exact_n column scoping + empty
    input, label_centroids with an s-prefixed label column."""
    import ray.data

    from parquet_hs_ray.pipelines.ann import label_centroids
    from parquet_hs_ray.pipelines.packing import length_bucket_batches
    from parquet_hs_ray.pipelines.text_analysis import sample_exact_n
    from parquet_hs_ray.pipelines.windows import rolling_mean

    # more blocks than rows: the sort can emit empty blocks
    tiny = pd.DataFrame({"doc_id": ["a", "b"], "n_tok": [10, 3000]})
    ds = ray.data.from_pandas([tiny.iloc[:1], tiny.iloc[1:],
                               tiny.iloc[:0], tiny.iloc[:0]])
    out = length_bucket_batches(ds, "doc_id", "n_tok", width=256,
                                batch_rows=4).to_pandas()
    assert len(out) == 2

    # NULL value rows are excluded from the rolling window (twin filters)
    ev = pd.DataFrame({"event_id": [1, 2, 3], "user_id": [1, 1, 1],
                       "ts": pd.date_range("2026-01-01", periods=3, freq="s"),
                       "value": [1.0, None, 3.0]})
    r = (rolling_mean(ray.data.from_pandas(ev), k=2).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    assert r["event_id"].tolist() == [1, 3]
    assert r["rolling_mean_cents"].tolist() == [100.0, 200.0]

    # columns excluding the id: no id leak; empty input returns empty
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "source": ["x", "y", "z"]}))
    s = sample_exact_n(docs, n=2, id_col="doc_id", columns=["source"])
    assert list(s.columns) == ["source"] and len(s) == 2
    empty = ray.data.from_pandas(pd.DataFrame({"doc_id": [], "source": []}))
    assert len(sample_exact_n(empty, n=5, columns=["source"])) == 0

    # label column starting with 's' must not be swept into sum columns
    emb_df = pd.DataFrame({"vec_id": [1, 2],
                           "embedding": [np.float32([1, 2]), np.float32([3, 4])],
                           "slabel": ["p", "p"]})
    c = label_centroids(ray.data.from_pandas(emb_df), label_col="slabel")
    assert c["centroid"].iloc[0] == [2.0, 3.0] and c["n"].iloc[0] == 2


def test_dedup_stats_by_source_cross_block(ray_session):
    """Duplicate texts split across blocks must still count once in
    n_distinct (global distinct, not per-batch)."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import dedup_stats_by_source

    df = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 3,
        "text": ["same", "same", "x", "y", "same", "same", "z"],
    })
    # the two 'a'/'same' copies land in DIFFERENT blocks
    ds = ray.data.from_pandas([df.iloc[[0, 2]], df.iloc[[1, 3]], df.iloc[4:]])
    out = dedup_stats_by_source(ds).to_pandas().set_index("source")
    assert out.loc["a", "n_docs"] == 4 and out.loc["a", "n_distinct"] == 3
    assert out.loc["a", "n_dups"] == 1
    assert out.loc["b", "n_docs"] == 3 and out.loc["b", "n_distinct"] == 2


def test_rolling_stats_matches_pandas(ray_session):
    """Rolling variance/z across blocks equals a pandas rolling recompute
    (sample var over cents); single-sample windows are dropped."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import rolling_stats

    rng = np.random.default_rng(15)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.sort(rng.integers(0, 4, n)),
        "ts": pd.Timestamp("2026-04-01") + pd.to_timedelta(np.arange(n), unit="s"),
        "value": np.round(rng.uniform(-9, 9, n), 3),
    })
    ds = ray.data.from_pandas([df.iloc[i * 40:(i + 1) * 40] for i in range(15)])
    out = (rolling_stats(ds, k=5).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    cents = pd.Series(np.round(df["value"].to_numpy() * 100.0).astype(np.int64))
    grp = cents.groupby(df["user_id"])
    roll = grp.rolling(5, min_periods=1)
    s = roll.sum().reset_index(drop=True).to_numpy()
    ss = (cents * cents).groupby(df["user_id"]).rolling(5, min_periods=1) \
        .sum().reset_index(drop=True).to_numpy()
    cnt = roll.count().reset_index(drop=True).to_numpy()
    keep = cnt > 1
    var = (cnt[keep] * ss[keep] - s[keep] * s[keep]) / (cnt[keep] * (cnt[keep] - 1))
    z = cents.to_numpy()[keep].astype(np.float64) - s[keep] / cnt[keep]
    assert np.array_equal(out["rolling_var_cents2"].to_numpy(), var)
    assert np.array_equal(out["z_cents"].to_numpy(), z)
    assert out["n_win"].min() >= 2 and len(out) == int(keep.sum())


def test_top_terms_per_source_matches_pandas(docs):
    from parquet_hs_ray.pipelines.text_analysis import top_terms_per_source

    out = (top_terms_per_source(docs, k=4).to_pandas()
           .sort_values(["source", "rank"]).reset_index(drop=True))
    raw = docs.to_pandas()
    words = raw["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    rows = []
    for src, ws in zip(raw["source"], words):
        rows += [(src, w) for w in ws]
    c = (pd.DataFrame(rows, columns=["source", "word"])
         .groupby(["source", "word"]).size().reset_index(name="n"))
    c = c.sort_values(["source", "n", "word"], ascending=[True, False, True])
    c["rank"] = c.groupby("source").cumcount() + 1
    ref = (c[c["rank"] <= 4].reset_index(drop=True)
           .astype({"n": np.int64, "rank": np.int64}))
    pd.testing.assert_frame_equal(out, ref)
    assert (out.groupby("source").size() <= 4).all()


def test_growth_accounting_multiday(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.windows import growth_accounting

    rng = np.random.default_rng(13)
    n = 5000
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 30 * 24 * 3600, n), unit="s"))
    ev = pd.DataFrame({"user_id": rng.integers(0, 300, n), "ts": ts})
    ds = ray.data.from_pandas([ev.iloc[i::8].reset_index(drop=True)
                               for i in range(8)])
    out = (growth_accounting(ds).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    f = ev.groupby("user_id")["ts"].min().dt.floor("D")
    exp = f.value_counts().sort_index()
    assert out["bucket"].tolist() == list(exp.index)
    assert out["new_users"].tolist() == exp.tolist()
    assert out["cum_users"].tolist() == exp.cumsum().tolist()
    assert int(out["cum_users"].iloc[-1]) == ev["user_id"].nunique()


def test_temperature_mix_quotas_and_determinism(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import temperature_mix

    # skewed sources: 800 'big', 100 'mid', 20 'small'
    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(920)],
        "source": ["big"] * 800 + ["mid"] * 100 + ["small"] * 20,
    })
    ds = ray.data.from_pandas([docs.iloc[i::4].reset_index(drop=True)
                               for i in range(4)])
    out = temperature_mix(ds, total=230, alpha=0.5).to_pandas()
    got = out.groupby("source").size()
    w = np.power(np.array([800.0, 100.0, 20.0]), 0.5)
    exp = np.minimum(np.floor(230.0 * w / w.sum()).astype(int),
                     [800, 100, 20])
    assert got["big"] == exp[0] and got["mid"] == exp[1] and got["small"] == exp[2]
    # alpha=0.5 up-weights small sources vs their natural share
    assert got["small"] / got.sum() > 20 / 920
    # deterministic: same selection on a re-run
    out2 = temperature_mix(ds, total=230, alpha=0.5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # alpha=1 approximates natural proportions
    nat = temperature_mix(ds, total=230, alpha=1.0).to_pandas()
    g1 = nat.groupby("source").size()
    assert g1["big"] > g1["mid"] > g1["small"]


def test_sample_fraction_bounds_and_determinism(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import sample_fraction

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(4000)]})
    ds = ray.data.from_pandas([df.iloc[i::4].reset_index(drop=True)
                               for i in range(4)])
    out = sample_fraction(ds, 0.25).to_pandas()
    # binomial(4000, 0.25): mean 1000, sd ~27 — 6 sigma bounds
    assert 840 <= len(out) <= 1160
    out2 = sample_fraction(ds, 0.25).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # nested property: p=0.1's sample is a subset of p=0.25's
    small = set(sample_fraction(ds, 0.1).to_pandas()["doc_id"])
    assert small <= set(out["doc_id"])
    # extremes
    assert sample_fraction(ds, 0.0).to_pandas().shape[0] == 0
    assert sample_fraction(ds, 1.0).to_pandas().shape[0] == 4000
    with pytest.raises(ValueError):
        sample_fraction(ds, 1.5)


def test_with_lag_matches_pandas_shift_across_blocks(ray_session):
    """lag/lead vs the pandas groupby-shift twin over 8 input blocks
    (post-sort layout is Ray's choice; 6 keys x 400 rows guarantees
    every boundary splits some key, exercising the carry fold)."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import with_lag

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 6, 400),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.permutation(400), unit="m"),
        "event_id": np.arange(400, dtype=np.int64),
        "value": np.round(rng.normal(10, 5, 400), 2)})
    ds = ray.data.from_pandas([df.iloc[i:i + 50] for i in range(0, 400, 50)])

    for how, n in [("lag", 1), ("lag", 3), ("lead", 2)]:
        got = (with_lag(ds, n=n, how=how).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        srt = df.sort_values(["user_id", "ts", "event_id"])
        exp_col = srt.groupby("user_id")["value"].shift(
            n if how == "lag" else -n)
        exp = (pd.DataFrame({"user_id": srt["user_id"],
                             "event_id": srt["event_id"],
                             f"{how}_value": exp_col})
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    with pytest.raises(ValueError, match="lag"):
        with_lag(ds, how="shift")
    with pytest.raises(ValueError, match=">= 1"):
        with_lag(ds, n=0)


def test_image_phash_dedup_planted(ray_session):
    """pHash near-dup: exact and lightly-edited PNG copies are found
    (hamming<=3), unrelated random images are not; non-PNG payloads are
    skipped unless strict."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from parquet_hs_ray.stages.media_codecs import encode_png, phash64, decode_png
    from parquet_hs_ray.stages.multimodal import image_phash, image_phash_dedup

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, size=(30, 20, 3), dtype=np.uint8)
            for i in range(20)]
    ids = list(range(20))
    payloads = [encode_png(im) for im in imgs]
    edited = imgs[0].copy(); edited[0, :3] ^= 255
    ids += [100, 101]
    payloads += [encode_png(imgs[0]), encode_png(edited)]  # exact + edited dup of 0
    t = pa.table({"media_id": pa.array(ids, pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    ds = ray.data.from_arrow(t)

    pairs = image_phash_dedup(ds, max_hamming=3, concurrency=2, batch_size=8)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 100) in found                     # exact copy: hamming 0
    ham = dict(zip(map(tuple, pairs[["a", "b"]].to_numpy()), pairs["hamming"]))
    assert ham[(0, 100)] == 0
    # edited copy is near 0 (and near its exact twin 100)
    assert (0, 101) in found or (100, 101) in found
    # no pair between two distinct random images
    for a, b in found:
        assert {a, b} & {0, 100, 101}, f"false positive pair ({a},{b})"

    # stage signature matches the direct kernel
    sigs = image_phash(ds, concurrency=2, batch_size=8).to_pandas()
    direct = np.uint64(phash64(decode_png(payloads[0]))).astype(np.int64)
    assert sigs.set_index("media_id").loc[0, "phash"] == direct

    # non-PNG payloads: skipped by default, raise when strict
    bad = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                    "payload": pa.array([b"not a png", None], pa.binary())})
    bds = ray.data.from_arrow(bad)
    assert len(image_phash(bds, concurrency=1, batch_size=4).to_pandas()) == 0
    with pytest.raises(Exception, match="non-PNG"):
        image_phash(bds, concurrency=1, batch_size=4,
                    strict=True).materialize()


def test_ann_topk_pq_recall_and_planted(ray_session):
    """PQ-ADC top-k: recall@10 vs exact brute force on the synthetic
    embeddings, and a planted near-duplicate must surface at rank 1."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.ann import (ann_topk_bruteforce, ann_topk_pq,
                                              pq_encode, pq_train)

    rng = np.random.default_rng(5)
    X = rng.normal(size=(400, 64)).astype(np.float32)
    X[399] = X[0] + 0.01 * rng.normal(size=64).astype(np.float32)  # planted dup of 0
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in X],
                                        pa.list_(pa.float32()))})
    emb = ray.data.from_arrow(t).repartition(4)

    exact = ann_topk_bruteforce(emb, query_ids=[0, 1, 2], k=10)
    approx = ann_topk_pq(emb, query_ids=[0, 1, 2], k=10, m=8, rerank=4)

    # planted near-dup is rank 1 for query 0
    a0 = approx[approx["query_id"] == 0].sort_values("rank")
    assert a0.iloc[0]["neighbor_id"] == 399

    hits = 0
    for q in (0, 1, 2):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
    assert hits / 30 >= 0.6, f"PQ recall too low: {hits}/30"

    # codes: fixed_size_binary(m), one byte per subspace, deterministic
    cb = pq_train(emb, m=8)
    codes = pq_encode(emb, cb).to_pandas()
    assert len(codes) == 400 and all(len(c) == 8 for c in codes["codes"])
    codes2 = pq_encode(emb, cb).to_pandas()
    assert codes.sort_values("vec_id")["codes"].tolist() == \
        codes2.sort_values("vec_id")["codes"].tolist()

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7)


def test_first_last_value_matches_pandas(ray_session):
    """first/last_value across block boundaries, NULL value at a group's
    first row, and single-row groups."""
    import numpy as np
    import pandas as pd
    import ray.data

    from parquet_hs_ray.pipelines.windows import first_last_value

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 4, 4],
        "ts": pd.to_datetime([10, 30, 20, 5, 50, 7, 9, 9], unit="s"),
        "event_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "value": [None, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
    })
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:5], df.iloc[5:]])
    out = (first_last_value(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    s = df.sort_values(["user_id", "ts", "event_id"])
    exp_first = s.groupby("user_id")["value"].transform("first")  # first incl. NaN?
    # pandas 'first' skips NaN; SQL first_value does NOT — compute manually
    fmap = {k: g.iloc[0]["value"] for k, g in s.groupby("user_id")}
    lmap = {k: g.iloc[-1]["value"] for k, g in s.groupby("user_id")}
    for _, r in out.iterrows():
        f, l = fmap[r["user_id"]], lmap[r["user_id"]]
        assert (np.isnan(r["first_value"]) and (f is None or np.isnan(f))) \
            or r["first_value"] == f
        assert r["last_value"] == l
    # user 1's first row (ts=10) has NULL value -> first_value NULL for all
    assert out[out["user_id"] == 1]["first_value"].isna().all()
    # ts tie in user 4 broken by event_id: first=7.0, last=8.0
    assert (out[out["user_id"] == 4]["first_value"] == 7.0).all()
    assert (out[out["user_id"] == 4]["last_value"] == 8.0).all()


def test_audio_fingerprint_dedup_planted(ray_session):
    """Spectral audio fingerprint: volume-scaled and WAV-roundtripped
    copies are found (hamming<=3), unrelated clips are not."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.stages.media_codecs import (audio_fingerprint64,
                                                    decode_wav, encode_wav)
    from parquet_hs_ray.stages.multimodal import audio_fingerprint_dedup

    rng = np.random.default_rng(9)
    clips, payloads, ids = [], [], []
    for i in range(12):
        t = np.arange(5000 + 64 * i)
        x = (9000 * np.sin(t / (2.5 + 0.4 * i))
             + 2500 * np.sin(t / (13 + 0.7 * i))
             + 200 * rng.normal(size=len(t)))
        clips.append(x)
        ids.append(i)
        payloads.append(encode_wav(x.astype(np.int16)[:, None], 16000))
    ids += [100, 101]
    payloads += [encode_wav((clips[0] * 0.4).astype(np.int16)[:, None], 16000),
                 encode_wav(clips[1].astype(np.int16)[:, None], 16000)]

    ds = ray.data.from_arrow(pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())}))
    pairs = audio_fingerprint_dedup(ds, max_hamming=3, concurrency=2,
                                    batch_size=6)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 100) in found      # volume-scaled copy
    assert (1, 101) in found      # bit-identical re-encode
    for a, b in found:
        assert {a, b} & {0, 1, 100, 101}, f"false positive ({a},{b})"

    # kernel invariance: amplitude scaling cancels in log-band differences
    pcm, rate = decode_wav(payloads[0])
    h1 = audio_fingerprint64(pcm, rate)
    h2 = audio_fingerprint64((pcm.astype(np.float64) * 0.25).astype(np.int16), rate)
    assert bin(np.uint64(h1) ^ np.uint64(h2)).count("1") <= 3
    # short-clip guard: doesn't crash on tiny inputs
    assert isinstance(audio_fingerprint64(np.ones(5, np.int16), 16000), int)


def test_ann_join_blockpair_matches_broadcast(ray_session):
    """Cross-corpus top-k join: the large-left block-pair path returns
    exactly the broadcast path's result; empty right blocks and k larger
    than one block are exercised."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.ann import ann_join

    rng = np.random.default_rng(17)
    L = rng.normal(size=(60, 16)).astype(np.float32)
    R = rng.normal(size=(90, 16)).astype(np.float32)

    def mk(ids0, X):
        t = pa.table({"vec_id": pa.array(range(ids0, ids0 + len(X)), pa.int64()),
                      "embedding": pa.array([list(map(float, r)) for r in X],
                                            pa.list_(pa.float32()))})
        return ray.data.from_arrow(t).repartition(5)

    left, right = mk(0, L), mk(1000, R)
    base = ann_join(left, right, k=7)
    paired = ann_join(left, right, k=7, broadcast_max=10, rows_per_block=25)
    pd.testing.assert_frame_equal(base, paired)
    assert set(base["query_id"]) == set(range(60))
    assert base.groupby("query_id").size().eq(7).all()
    assert base["neighbor_id"].between(1000, 1089).all()


def test_rolling_time_sum_matches_pandas(ray_session):
    """Time-RANGE rolling sum vs a direct O(n^2) python computation:
    timestamp ties (RANGE peers see each other), multi-block carries, and
    the documented NULL-at-lonely-ts contract."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import rolling_time_sum

    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(1, 5, size=n),
        "ts": pd.to_datetime(rng.integers(0, 500, size=n) * 1_000_000
                             + 1_000_000, unit="us"),  # heavy ts ties
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.uniform(0, 9, size=n), 2),
    })
    itv = 60_000_000  # 60 s
    ds = ray.data.from_pandas([df.iloc[i:i + 75] for i in range(0, n, 75)])
    got = (rolling_time_sum(ds, interval_us=itv).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    exp = np.empty(n, dtype=np.int64)
    for i in range(n):
        m = (df["user_id"].to_numpy() == df["user_id"].iloc[i]) & \
            (us >= us[i] - itv) & (us <= us[i])
        exp[i] = cents[m].sum()
    assert (got["win_c"].to_numpy() == exp).all()

    # NULL value at a lonely ts -> win_c NULL (documented contract)
    df2 = pd.DataFrame({"user_id": [1, 1], "event_id": [1, 2],
                        "ts": pd.to_datetime([100, 200], unit="s"),
                        "value": [1.0, None]})
    got2 = (rolling_time_sum(ray.data.from_pandas(df2), interval_us=itv)
            .to_pandas().set_index("event_id"))
    assert got2.loc[1, "win_c"] == 100
    assert pd.isna(got2.loc[2, "win_c"])


def test_ewma_matches_pandas_across_blocks(ray_session):
    """Distributed linear-recurrence scan vs sequential pandas
    ewm(adjust=False): multi-block keys, NaN pass-through, single-user
    corpus spanning every block, leading NaNs."""
    import ray.data

    from parquet_hs_ray.pipelines.windows import ewma

    rng = np.random.default_rng(41)
    n = 800
    df = pd.DataFrame({
        "user_id": np.sort(rng.integers(1, 5, size=n)),
        "ts": pd.to_datetime(np.arange(n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.uniform(-5, 5, size=n),
    })
    df.loc[df.index % 11 == 0, "value"] = np.nan   # NaNs pass state through
    ds = ray.data.from_pandas([df.iloc[i:i + 60] for i in range(0, n, 60)])
    got = (ewma(ds, alpha=0.3).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    exp = (df.sort_values(["user_id", "ts", "event_id"])
           .groupby("user_id")["value"]
           .transform(lambda s: s.ewm(alpha=0.3, adjust=False, ignore_na=True).mean()))
    exp = exp.reindex(got.index)
    both = ~(got["ewma"].isna() | exp.isna())
    assert both.sum() > 700
    np.testing.assert_allclose(got["ewma"][both], exp[both], rtol=1e-10)
    # NaN only where pandas is NaN (leading NaNs of a key)
    assert (got["ewma"].isna() == exp.isna()).all()

    # single user across all blocks: the pure carry-chain path
    one = df.copy()
    one["user_id"] = 7
    got1 = (ewma(ray.data.from_pandas(
        [one.iloc[i:i + 60] for i in range(0, n, 60)]), alpha=0.2)
        .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp1 = one["value"].ewm(alpha=0.2, adjust=False, ignore_na=True).mean()
    b1 = ~(got1["ewma"].isna() | exp1.isna())
    np.testing.assert_allclose(got1["ewma"][b1], exp1[b1], rtol=1e-10)

    import pytest

    with pytest.raises(ValueError, match="alpha"):
        ewma(ds, alpha=1.5)


def test_dedup_minhash_tokens_planted(ray_session):
    """Token-id minhash dedup: planted exact and near (1-token-edited)
    copies are found; the shingler handles empty/NULL token lists."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.functions.sketches import token_ngram_hashes
    from parquet_hs_ray.pipelines.dedup import dedup_minhash_tokens

    rng = np.random.default_rng(51)
    docs = [rng.integers(0, 500, size=rng.integers(40, 80)).tolist()
            for _ in range(30)]
    ids = [f"d{i:03d}" for i in range(30)]
    near = docs[0][:]
    near[5] = 499 - near[5]                  # one token edited
    ids += ["dup_exact", "dup_near", "empty"]
    docs += [docs[1][:], near, []]
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(docs, pa.list_(pa.int32())),
                  "n_tok": pa.array([len(d) for d in docs], pa.int32()),
                  "source": pa.array(["s"] * len(docs))})
    ds = ray.data.from_arrow(t).repartition(3)

    pairs = dedup_minhash_tokens(ds, threshold=0.7)
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert ("d001", "dup_exact") in got
    assert ("d000", "dup_near") in got
    jac = dict(zip(map(tuple, pairs[["a", "b"]].to_numpy()), pairs["jaccard"]))
    assert jac[("d001", "dup_exact")] == 1.0
    assert 0.7 <= jac[("d000", "dup_near")] < 1.0

    # kernel: empty + NULL lists produce zero shingles, short lists < n too
    n_sh, h = token_ngram_hashes(pd.Series([[1, 2], None, [], [1, 2, 3, 4]]), n=3)
    assert list(n_sh) == [0, 0, 0, 2] and len(h) == 2


def test_pack_doc_starts_consistent_with_global_pack(ray_session):
    """Doc-start metadata: every start position is < context_len, each
    sequence's starts are sorted, the total equals the doc count, and the
    result is blocking-independent (1 block == 5 blocks)."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.packing import pack_global_doc_starts

    rng = np.random.default_rng(61)
    docs = [rng.integers(0, 99, size=rng.integers(1, 40)).tolist()
            for _ in range(120)]
    docs[7] = []                                     # zero-length doc
    t = pa.table({"doc_id": pa.array([f"d{i:04d}" for i in range(120)]),
                  "tokens": pa.array(docs, pa.list_(pa.int32()))})
    L = 64
    one = (pack_global_doc_starts(ray.data.from_arrow(t), context_len=L)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    five = (pack_global_doc_starts(ray.data.from_arrow(t).repartition(5),
                                   context_len=L)
            .to_pandas().sort_values("seq_id").reset_index(drop=True))
    assert one["seq_id"].tolist() == five["seq_id"].tolist()
    for a, b in zip(one["doc_starts"], five["doc_starts"]):
        assert list(a) == list(b)
    flat = [s for lst in one["doc_starts"] for s in lst]
    assert len(flat) == 120                          # every doc marks a start
    assert all(0 <= s < L for s in flat)
    for lst in one["doc_starts"]:
        assert list(lst) == sorted(lst)
    # direct check against a python scan
    g = 0
    exp = {}
    for d in docs:
        exp.setdefault(g // L, []).append(g % L)
        g += len(d)
    assert {int(r.seq_id): list(r.doc_starts) for r in one.itertuples()} == exp


def test_dsir_scores_match_bruteforce(docs):
    """DSIR integer math: the distributed two-histogram + bincount score
    must equal a driver-side recompute with exact Python-int bit_length
    arithmetic over the same hashed feature buckets."""
    import ray.data

    from parquet_hs_ray.functions import sketches as sk
    from parquet_hs_ray.functions.text import flatten_words
    from parquet_hs_ray.pipelines.text_analysis import dsir_scores

    B = 64
    target = docs.map_batches(lambda b: b[b["doc_id"] % 3 == 0],
                              batch_format="pandas")
    out = (dsir_scores(docs, target, n_buckets=B).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    raw = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def feats(texts):
        t = texts.fillna("").str.lower().str.split()
        lens = t.str.len().astype(np.int64).to_numpy()
        flat = flatten_words(t, lens)
        if not len(flat):
            return lens, np.empty(0, np.int64), np.empty(0, np.int64)
        uh = sk.word_hashes(flat)
        n_bi, bh = sk._ngram_combine(lens, uh, 2)
        bkt = np.concatenate([uh % np.uint64(B),
                              bh % np.uint64(B)]).astype(np.int64)
        doc_of = np.concatenate([
            np.repeat(np.arange(len(t)), lens),
            np.repeat(np.arange(len(t)), n_bi)]).astype(np.int64)
        return lens + n_bi, bkt, doc_of

    n_feats, bkt, doc_of = feats(raw["text"])
    t_mask = (raw["doc_id"].to_numpy() % 3 == 0)
    s_cnt = np.bincount(bkt, minlength=B)
    t_cnt = np.bincount(bkt[t_mask[doc_of]], minlength=B)
    s_tot, t_tot = int(s_cnt.sum()), int(t_cnt.sum())
    lam = [((s_tot + B) // (int(s) + 1)).bit_length()
           - ((t_tot + B) // (int(t) + 1)).bit_length()
           for s, t in zip(s_cnt, t_cnt)]
    ref_score = np.zeros(len(raw), dtype=np.int64)
    for d, b in zip(doc_of, bkt):
        ref_score[d] += lam[b]
    assert (out["doc_id"].to_numpy() == raw["doc_id"].to_numpy()).all()
    assert (out["n_feats"].to_numpy() == n_feats).all()
    assert (out["dsir_score"].to_numpy() == ref_score).all()


def test_dsir_planted_target_affinity(ray_session):
    """Documents sharing the target slice's vocabulary must outscore
    vocabulary-disjoint documents; empty docs score 0 and stay present."""
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import dsir_scores

    target_text = "quantum flux capacitor resonance cascade"
    rows = []
    for i in range(8):
        rows.append({"doc_id": i, "text": target_text})          # target-like
    for i in range(8, 16):
        rows.append({"doc_id": i, "text": "mundane filler boilerplate words"})
    rows.append({"doc_id": 16, "text": ""})
    raw = ray.data.from_pandas(pd.DataFrame(rows))
    target = raw.map_batches(lambda b: b[b["doc_id"] < 4],
                             batch_format="pandas")
    out = (dsir_scores(raw, target, n_buckets=128).to_pandas()
           .set_index("doc_id"))
    assert len(out) == 17
    like = out.loc[range(8), "dsir_score"].min()
    unlike = out.loc[range(8, 16), "dsir_score"].max()
    assert like > unlike
    assert out.loc[16, "dsir_score"] == 0 and out.loc[16, "n_feats"] == 0


def test_dedup_exact_tokens_planted(ray_session):
    """Identical token sequences group (min doc_id wins); [] and NULL are
    DISTINCT groups (SQL GROUP BY semantics); value dtype doesn't leak
    into the hash (same ids in int32 vs padded values differ)."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.dedup import dedup_exact_tokens

    toks = [[1, 2, 3], [1, 2, 3], [9], [], [], None, [1, 2], [1, 2, 3]]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(8)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    out = (dedup_exact_tokens(ray.data.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["n_dups"]))
    assert got == {"d0": 3, "d2": 1, "d3": 2, "d5": 1, "d6": 1}


def test_token_budget_mix_quota_conservation(ray_session):
    """Kept token mass per source never exceeds its quota; adding one
    more md5-ranked doc would exceed it (greedy maximality); output is a
    row subset of the input."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.text_analysis import token_budget_mix

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "doc_id": [f"doc-{i:06d}" for i in range(n)],
        "source": rng.choice(["a", "b", "c"], size=n),
        "n_tok": rng.integers(10, 500, size=n).astype(np.int32),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 50] for i in range(0, n, 50)])
    total = 20_000
    out = token_budget_mix(ds, total_tokens=total, alpha=0.5).to_pandas()
    toks = df.groupby("source")["n_tok"].sum().astype(np.float64)
    w = np.power(toks.to_numpy(), 0.5)
    quota = dict(zip(toks.index,
                     np.floor(total * w / w.sum()).astype(np.int64)))
    # subset + per-source conservation + maximality
    merged = out.merge(df, on=["doc_id", "source", "n_tok"], how="left",
                       indicator=True)
    assert (merged["_merge"] == "both").all()
    for src, g in df.groupby("source"):
        kept = set(out.loc[out["source"] == src, "doc_id"])
        k = g.copy()
        k["h"] = [hashlib.md5(f"42:{v}".encode()).hexdigest()
                  for v in k["doc_id"]]
        k = k.sort_values(["h", "doc_id"], kind="mergesort")
        cum = k["n_tok"].astype(np.int64).cumsum()
        want = set(k.loc[cum <= quota[src], "doc_id"])
        assert kept == want, src


def test_semdedup_planted_groups(ray_session):
    """Planted near-identical embedding groups: exactly one exemplar
    survives per group (the farthest-from-centroid member), distinct
    vectors all survive."""
    import ray.data

    from parquet_hs_ray.pipelines.dedup import semdedup

    rng = np.random.default_rng(17)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, gid = [], 0
    truth_groups = []
    for i in range(40):
        if i % 5 == 0:  # plant a near-dup triple
            grp = []
            for j in range(3):
                v = base[i] + rng.normal(scale=1e-4, size=16)
                rows.append({"vec_id": gid, "embedding": v.tolist()})
                grp.append(gid)
                gid += 1
            truth_groups.append(grp)
        else:
            rows.append({"vec_id": gid, "embedding": base[i].tolist()})
            gid += 1
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas([df.iloc[i::3].reset_index(drop=True)
                               for i in range(3)])
    out = semdedup(ds, tau=0.999, n_clusters=4, sample_size=64,
                   seed=3).to_pandas().set_index("vec_id")
    # every planted triple keeps exactly one member
    for grp in truth_groups:
        assert out.loc[grp, "keep"].sum() == 1, grp
    # vectors outside any planted group all survive
    planted = {x for g in truth_groups for x in g}
    others = [i for i in range(gid) if i not in planted]
    assert out.loc[others, "keep"].all()
    assert out["cluster"].between(0, 3).all()


def test_semdedup_no_dups_keeps_everything(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.dedup import semdedup

    rng = np.random.default_rng(23)
    M = rng.normal(size=(30, 8))
    df = pd.DataFrame({"vec_id": np.arange(30),
                       "embedding": [v.tolist() for v in M]})
    out = semdedup(ray.data.from_pandas(df), tau=0.9999,
                   n_clusters=3, sample_size=32).to_pandas()
    assert out["keep"].all() and len(out) == 30
