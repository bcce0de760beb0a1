"""Training-prep transforms: deterministic MLM masking, label shift,
truncation — edge cases (empty/null/single-token lists) and the
determinism/loss-mask contracts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from parquet_hs_ray.pipelines.trainprep import (
    mask_tokens_mlm, shift_labels, truncate_sequences)


def _tbl(toks, vtype=pa.int32()):
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(toks))]),
        "tokens": pa.array(toks, pa.list_(vtype)),
        "n_tok": pa.array([0 if x is None else len(x) for x in toks],
                          pa.int32()),
        "source": pa.array(["s"] * len(toks)),
    })


def _collect(ds):
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow")).sort_by("doc_id")


def test_mask_tokens_deterministic_and_loss_mask(ray_session):
    toks = [[5, 9, 5, 9, 5, 9] * 20, [7], [], None]
    out = _collect(mask_tokens_mlm(ray.data.from_arrow(_tbl(toks)),
                                   mask_id=999, rate_pct=50, seed=3))
    tok_l = out["tokens"].to_pylist()
    lab_l = out["labels"].to_pylist()
    nm = out["n_masked"].to_pylist()
    # same (token, pos) -> same decision: re-run must be identical
    out2 = _collect(mask_tokens_mlm(ray.data.from_arrow(_tbl(toks)),
                                    mask_id=999, rate_pct=50, seed=3))
    assert tok_l == out2["tokens"].to_pylist()
    # loss-mask contract: masked <-> labels carry the original value
    orig = toks[0]
    for t, l, o in zip(tok_l[0], lab_l[0], orig):
        if t == 999:
            assert l == o
        else:
            assert t == o and l == -100
    assert nm[0] == sum(1 for t in tok_l[0] if t == 999)
    # at 50% over 120 positions some but not all mask
    assert 0 < nm[0] < len(orig)
    # empties / nulls survive
    assert tok_l[2] == [] and tok_l[3] is None and nm[2] == 0 and nm[3] == 0
    # rate 0 masks nothing; rate 100 masks everything
    all0 = _collect(mask_tokens_mlm(ray.data.from_arrow(_tbl(toks)),
                                    mask_id=999, rate_pct=0))
    assert all0["n_masked"].to_pylist()[0] == 0
    all100 = _collect(mask_tokens_mlm(ray.data.from_arrow(_tbl(toks)),
                                      mask_id=999, rate_pct=100))
    assert all100["n_masked"].to_pylist()[0] == len(orig)


def test_shift_labels_boundaries(ray_session):
    toks = [[1, 2, 3], [7], [], None]
    out = _collect(shift_labels(ray.data.from_arrow(_tbl(toks))))
    assert out["labels"].to_pylist() == [[2, 3, -100], [-100], [], None]
    # input columns untouched
    assert out["tokens"].to_pylist() == [[1, 2, 3], [7], [], None]


def test_truncate_sequences_clamps(ray_session):
    toks = [[1, 2, 3, 4, 5], [9], [], None]
    out = _collect(truncate_sequences(ray.data.from_arrow(_tbl(toks)),
                                      max_len=3))
    assert out["tokens"].to_pylist() == [[1, 2, 3], [9], [], None]
    assert out["n_tok"].to_pylist() == [3, 1, 0, 0]
    assert out["tokens"].type.value_type == pa.int32()
    with pytest.raises(ValueError):
        truncate_sequences(ray.data.from_arrow(_tbl(toks)), max_len=-1)
    z = _collect(truncate_sequences(ray.data.from_arrow(_tbl(toks)),
                                    max_len=0))
    assert z["tokens"].to_pylist() == [[], [], [], None]


def test_fim_transform_psm_layout(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.trainprep import fim_transform

    t = pa.table({"doc_id": ["a", "b", "c", "d"],
                  "tokens": [[1, 2, 3, 4, 5], [9], None, [7, 8]],
                  "n_tok": pa.array([5, 1, 0, 2], pa.int32())})
    out = pa.concat_tables(ray.get(
        fim_transform(ray.data.from_arrow(t), rate_pct=100).to_arrow_refs()))
    d = out.to_pydict()

    def expect(did, toks):
        n = len(toks)
        hx = hashlib.md5(did.encode()).hexdigest()
        a = 1 + int(hx[8:16], 16) % (n - 1)
        b = a + int(hx[16:24], 16) % (n - a)
        return [50281] + toks[:a] + [50282] + toks[b:] + [50283] + toks[a:b]

    assert d["tokens"][0] == expect("a", [1, 2, 3, 4, 5])
    assert d["tokens"][3] == expect("d", [7, 8])
    assert d["tokens"][1] == [9] and d["tokens"][2] is None  # too short / null
    assert d["fim"] == [True, False, False, True]
    assert d["n_tok"] == [8, 1, 0, 5]
    assert out.schema.field("n_tok").type == pa.int32()  # type preserved
    # suffix is never empty; token multiset preserved (+3 sentinels)
    assert sorted(d["tokens"][0]) == sorted([1, 2, 3, 4, 5, 50281, 50282, 50283])


def test_fim_rate_zero_is_identity(ray_session):
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.trainprep import fim_transform

    t = pa.table({"doc_id": ["a", "b"], "tokens": [[1, 2, 3], [4, 5]],
                  "n_tok": pa.array([3, 2], pa.int32())})
    out = pa.concat_tables(ray.get(
        fim_transform(ray.data.from_arrow(t), rate_pct=0).to_arrow_refs()))
    assert out["tokens"].to_pylist() == [[1, 2, 3], [4, 5]]
    assert out["fim"].to_pylist() == [False, False]


def test_fim_blocking_independent(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.trainprep import fim_transform

    rng = np.random.default_rng(3)
    rows = [{"doc_id": f"doc-{i:04d}",
             "tokens": rng.integers(0, 1000, rng.integers(1, 40)).tolist(),
             "n_tok": 0} for i in range(300)]
    df = pd.DataFrame(rows)
    df["n_tok"] = df["tokens"].str.len().astype("int32")
    a = pa.concat_tables(ray.get(fim_transform(
        ray.data.from_pandas(df)).to_arrow_refs())).sort_by("doc_id")
    b = pa.concat_tables(ray.get(fim_transform(ray.data.from_pandas(
        [df.iloc[i::7].reset_index(drop=True) for i in range(7)]))
        .to_arrow_refs())).sort_by("doc_id")
    assert a.equals(b.select(a.column_names).cast(a.schema))


def _dk_tbl(toks):
    """Native-shape table with the int64 doc key span_corrupt hashes on."""
    t = _tbl(toks)
    return t.append_column(
        "dk", pa.array(np.arange(len(toks), dtype=np.int64) * 13 + 5))


def test_span_corrupt_reconstruction(ray_session):
    """Replacing each sentinel in `inputs` with its span from `targets`
    reproduces the original tokens exactly (the T5 corruption
    invariant), for every document including empty and sub-block ones."""
    from parquet_hs_ray.pipelines.trainprep import span_corrupt

    rng = np.random.default_rng(11)
    toks = [rng.integers(0, 50000, int(rng.integers(0, 25))).tolist()
            for _ in range(200)]
    t = _dk_tbl(toks)
    out = _collect(span_corrupt(ray.data.from_arrow(t), span_len=3,
                                rate_pct=40, sentinel_base=90_000))
    assert out.column_names == ["doc_id", "inputs", "targets", "n_spans"]
    orig = {d: x for d, x in zip(t["doc_id"].to_pylist(),
                                 t["tokens"].to_pylist())}
    saw_span = 0
    for d, inp, tgt, ns in zip(out["doc_id"].to_pylist(),
                               out["inputs"].to_pylist(),
                               out["targets"].to_pylist(),
                               out["n_spans"].to_pylist()):
        # split targets at sentinel positions -> span k follows sentinel k
        spans = {}
        cur = None
        for v in tgt:
            if v >= 90_000:
                cur = v
                spans[cur] = []
            else:
                spans[cur].append(v)
        assert len(spans) == ns
        rebuilt = []
        for v in inp:
            rebuilt.extend(spans[v] if v >= 90_000 else [v])
        assert rebuilt == orig[d]
        saw_span += ns
    assert saw_span > 0


def test_span_corrupt_rate_zero_and_full(ray_session):
    from parquet_hs_ray.pipelines.trainprep import span_corrupt

    toks = [[1, 2, 3, 4, 5], [], [7]]
    t = _dk_tbl(toks)
    z = _collect(span_corrupt(ray.data.from_arrow(t), rate_pct=0))
    assert z["inputs"].to_pylist() == toks
    assert z["targets"].to_pylist() == [[], [], []]
    assert z["n_spans"].to_pylist() == [0, 0, 0]
    f = _collect(span_corrupt(ray.data.from_arrow(t), span_len=2,
                              rate_pct=100, sentinel_base=900))
    # every block corrupted: inputs are pure sentinels 900,901,...
    assert f["inputs"].to_pylist() == [[900, 901, 902], [], [900]]
    assert f["targets"].to_pylist() == [
        [900, 1, 2, 901, 3, 4, 902, 5], [], [900, 7]]


def test_span_corrupt_block_layout_independent(ray_session):
    from parquet_hs_ray.pipelines.trainprep import span_corrupt

    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 100, int(rng.integers(0, 30))).tolist()
            for _ in range(150)]
    t = _dk_tbl(toks)
    a = _collect(span_corrupt(ray.data.from_arrow(t)))
    parts = [t.slice(i, 1) for i in range(t.num_rows)]
    b = _collect(span_corrupt(ray.data.from_arrow_refs(
        [ray.put(pa.concat_tables(parts[i::11])) for i in range(11)])))
    assert a.equals(b)


def test_chunk_sequences_windows(ray_session):
    """Window layout: stride overlap, short-tail last window, empty doc
    yields no chunks, exactly-max_len doc yields one window."""
    from parquet_hs_ray.pipelines.trainprep import chunk_sequences

    toks = [list(range(10)),   # M=4,S=3 -> [0:4],[3:7],[6:10]
            [],                # no chunks
            [1, 2, 3, 4],      # exactly M -> one chunk
            [5, 6, 7, 8, 9]]   # M+1 -> [0:4],[3:5]
    t = _tbl(toks)
    out = _collect(chunk_sequences(ray.data.from_arrow(t), max_len=4,
                                   stride=3))
    got = {}
    for d, k, c in zip(out["doc_id"].to_pylist(),
                       out["chunk_id"].to_pylist(),
                       out["tokens"].to_pylist()):
        got.setdefault(d, []).append((k, c))
    assert got["d0"] == [(0, [0, 1, 2, 3]), (1, [3, 4, 5, 6]),
                         (2, [6, 7, 8, 9])]
    assert "d1" not in got
    assert got["d2"] == [(0, [1, 2, 3, 4])]
    assert got["d3"] == [(0, [5, 6, 7, 8]), (1, [8, 9])]
    assert out["n_tok"].to_pylist() == [len(c) for c in
                                        out["tokens"].to_pylist()]


def test_chunk_sequences_coverage_and_layout(ray_session):
    """Every token position is covered by >=1 window; window k starts at
    k*stride; identical output across block layouts."""
    from parquet_hs_ray.pipelines.trainprep import chunk_sequences

    rng = np.random.default_rng(17)
    toks = [rng.integers(0, 1000, int(rng.integers(0, 80))).tolist()
            for _ in range(120)]
    t = _tbl(toks)
    a = _collect(chunk_sequences(ray.data.from_arrow(t), max_len=16,
                                 stride=11))
    orig = {d: x for d, x in zip(t["doc_id"].to_pylist(),
                                 t["tokens"].to_pylist())}
    cov = {d: set() for d in orig}
    for d, k, c in zip(a["doc_id"].to_pylist(), a["chunk_id"].to_pylist(),
                       a["tokens"].to_pylist()):
        s = k * 11
        assert c == orig[d][s:s + 16]
        cov[d].update(range(s, s + len(c)))
    for d, x in orig.items():
        assert cov[d] == set(range(len(x)))
    parts = [t.slice(i, 1) for i in range(t.num_rows)]
    b = _collect(chunk_sequences(ray.data.from_arrow_refs(
        [ray.put(pa.concat_tables(parts[i::9])) for i in range(9)]),
        max_len=16, stride=11))
    assert a.sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")]) \
        .equals(b.sort_by([("doc_id", "ascending"),
                           ("chunk_id", "ascending")]))


def test_ul2_mixture_partition_and_reconstruction(ray_session):
    """Every doc appears exactly once with one denoiser tag; span
    branches obey the T5 reconstruction invariant; the S branch is
    prefix + sentinel / sentinel + suffix-quarter."""
    from parquet_hs_ray.pipelines.trainprep import ul2_mixture

    rng = np.random.default_rng(43)
    toks = [rng.integers(0, 50000, int(rng.integers(0, 30))).tolist()
            for _ in range(300)]
    t = _dk_tbl(toks)
    out = _collect(ul2_mixture(ray.data.from_arrow(t),
                               sentinel_base=90_000))
    assert out.column_names == ["doc_id", "inputs", "targets", "n_spans",
                                "denoiser"]
    assert sorted(out["doc_id"].to_pylist()) == \
        sorted(t["doc_id"].to_pylist())
    tags = set(out["denoiser"].to_pylist())
    assert tags == {"r", "x", "xd", "s"}
    orig = {d: x for d, x in zip(t["doc_id"].to_pylist(),
                                 t["tokens"].to_pylist())}
    for d, inp, tgt, ns, tag in zip(out["doc_id"].to_pylist(),
                                    out["inputs"].to_pylist(),
                                    out["targets"].to_pylist(),
                                    out["n_spans"].to_pylist(),
                                    out["denoiser"].to_pylist()):
        x = orig[d]
        if tag == "s":
            if not x:
                assert inp == [] and tgt == [] and ns == 0
                continue
            c = (3 * len(x)) // 4
            assert inp == x[:c] + [90_000]
            assert tgt == [90_000] + x[c:]
            assert ns == 1
        else:
            spans, cur = {}, None
            for v in tgt:
                if v >= 90_000:
                    cur = v
                    spans[cur] = []
                else:
                    spans[cur].append(v)
            assert len(spans) == ns
            rebuilt = []
            for v in inp:
                rebuilt.extend(spans[v] if v >= 90_000 else [v])
            assert rebuilt == x


def test_ul2_mixture_layout_independent(ray_session):
    from parquet_hs_ray.pipelines.trainprep import ul2_mixture

    rng = np.random.default_rng(47)
    toks = [rng.integers(0, 100, int(rng.integers(0, 25))).tolist()
            for _ in range(160)]
    t = _dk_tbl(toks)
    key = [("doc_id", "ascending")]
    a = _collect(ul2_mixture(ray.data.from_arrow(t))).sort_by(key)
    parts = [t.slice(i, 1) for i in range(t.num_rows)]
    b = _collect(ul2_mixture(ray.data.from_arrow_refs(
        [ray.put(pa.concat_tables(parts[i::13])) for i in range(13)]))
        ).sort_by(key)
    assert a.equals(b)


def test_span_corrupt_trailing_empty_docs(ray_session):
    """Empty/null docs at the END of a batch must not crash the block
    arithmetic (regression: b_starts indexed past excl)."""
    from parquet_hs_ray.pipelines.trainprep import span_corrupt, ul2_mixture

    toks = [[1, 2, 3, 4, 5, 6], [], []]
    t = _dk_tbl(toks)
    out = _collect(span_corrupt(ray.data.from_arrow(t), rate_pct=100,
                                span_len=2, sentinel_base=700))
    assert out["inputs"].to_pylist() == [[700, 701, 702], [], []]
    assert out["n_spans"].to_pylist() == [3, 0, 0]
    # and through every ul2 class (the filtered sub-table can also end
    # in an empty doc)
    big = _dk_tbl([[1, 2, 3]] * 8 + [[]] * 8)
    u = _collect(ul2_mixture(ray.data.from_arrow(big)))
    assert len(u) == 16


def test_chunk_sequences_rejects_stride_gt_max_len(ray_session):
    from parquet_hs_ray.pipelines.trainprep import chunk_sequences

    with pytest.raises(ValueError, match="stride"):
        chunk_sequences(ray.data.from_arrow(_tbl([[1, 2, 3]])),
                        max_len=2, stride=10)
