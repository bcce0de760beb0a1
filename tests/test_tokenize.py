"""Tokenizer stage tests: deterministic vocab ranking, OOV handling,
empty documents, and the encode-job handoff (tokens table is a valid
encode input)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from parquet_hs_ray.pipelines.tokenize import build_vocab, tokenize, tokenize_corpus


def _docs(texts):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "source": ["s"] * len(texts),
    }))


def test_vocab_rank_and_tie_break(ray_session):
    # freq: b=3, a=2, c=2, d=1 -> ids: b=0, a=1 (tie a<c), c=2, d=3
    docs = _docs(["b a c", "b a c", "b d"])
    v = build_vocab(docs, size=3)
    assert v["word"].tolist() == ["b", "a", "c"]
    assert v["token_id"].tolist() == [0, 1, 2]


def test_tokenize_oov_and_empty(ray_session):
    docs = _docs(["b a zzz", "", "B A!"])  # lowercase + punctuation split
    # freq: a=2, b=2, zzz=1; tie a<b -> vocab {a:0, b:1}; OOV id 2
    v = build_vocab(docs, size=2)
    out = (tokenize(docs, v).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert [list(t) for t in out["tokens"]] == [[1, 0, 2], [], [1, 0]]
    assert out["n_tok"].tolist() == [3, 0, 2]
    assert out["source"].tolist() == ["s"] * 3


def test_tokenize_feeds_encode_job(ray_session, tmp_path):
    """The tokenizer output is a valid encode_job input: the blobs
    decode back to per-row token-equality."""
    from parquet_hs_ray.format import decode_table, encode_table

    texts = [f"w{i % 7} common word stream {'x ' * (i % 5)}" for i in range(50)]
    toks = tokenize_corpus(_docs(texts), vocab_size=8)
    tbl = toks.to_arrow_refs()
    import ray as _ray
    import pyarrow as pa
    full = pa.concat_tables([_ray.get(r) for r in tbl]).combine_chunks()
    blob, stats = encode_table(full)
    assert decode_table(blob).equals(full)
    assert stats["tokens"].codec.startswith("list<")


def test_token_frequencies_matches_flat_count(ray_session):
    """Distributed histogram == numpy count over the flattened token
    stream, including empty docs (contribute nothing) and OOV ids."""
    import numpy as np
    import pandas as pd

    from parquet_hs_ray.pipelines.tokenize import token_frequencies

    docs = _docs(["b a zzz qqq", "", "b a a"])
    v = build_vocab(docs, size=2)  # a=0, b=1; OOV id 2
    tok = tokenize(docs, v)
    out = (token_frequencies(tok).to_pandas()
           .sort_values("token_id").reset_index(drop=True))
    ref = pd.DataFrame({"token_id": np.int64([0, 1, 2]),
                        "n": np.int64([3, 2, 2])})
    pd.testing.assert_frame_equal(out, ref)


def test_train_bpe_matches_reference_trainer(ray_session):
    """Distributed merge training must equal a straightforward in-memory
    Sennrich trainer bit-for-bit (same tie-break), including overlapping
    pairs ('aaa' counts (a,a) twice, merges once left-to-right)."""
    import re
    from collections import Counter

    import ray.data

    from parquet_hs_ray.pipelines.tokenize import train_bpe

    texts = ["the cat sat on the mat", "the bat and the cat", "aaa abab",
             "low lower lowest", "newer newest new", ""] * 3
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas([df.iloc[i::4].reset_index(drop=True)
                               for i in range(4)])
    out = train_bpe(ds, n_merges=12, min_count=2)
    # the fully distributed round loop must agree with the driver fast path
    out_dist = train_bpe(ds, n_merges=12, min_count=2, driver_vocab_rows=0)
    pd.testing.assert_frame_equal(out, out_dist)

    # in-memory reference
    wc = Counter()
    for t in texts:
        wc.update(re.findall(r"[a-z0-9]+", t.lower()))
    words = {w: (list(w), c) for w, c in wc.items()}
    ref = []
    for _ in range(12):
        pc = Counter()
        for syms, c in words.values():
            for a, b in zip(syms[:-1], syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (la, rb), cnt = best
        ref.append((la, rb, cnt))
        for w, (syms, c) in words.items():
            out_s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out_s.append(la + rb)
                    i += 2
                else:
                    out_s.append(syms[i])
                    i += 1
            words[w] = (out_s, c)
    assert list(zip(out["left"], out["right"], out["count"])) == ref
    assert out["rank"].tolist() == list(range(len(ref)))
    # 'aaa' sanity: (a,a) counted twice per occurrence pre-merge
    assert ("a", "a") in {(l, r) for l, r, _ in ref} or len(ref) == 12


def test_bpe_encode_segments_and_inverts(ray_session):
    """bpe_encode: token ids decode back to the exact source words (byte
    ids for chars, 256+rank for merges), and a word from the training
    corpus segments exactly as the trainer's final state would."""
    import ray.data

    from parquet_hs_ray.pipelines.tokenize import bpe_encode, train_bpe

    texts = ["lower lowest low", "newer newest new", "wider widest"] * 5
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    merges = train_bpe(ds, n_merges=10, min_count=2)
    enc = (bpe_encode(ds, merges, concurrency=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    id2sym = {256 + int(r["rank"]): r["left"] + r["right"]
              for _, r in merges.iterrows()}

    def decode(ids):
        return "".join(id2sym.get(int(i), chr(int(i))) for i in ids)

    import re
    for row, text in zip(enc.itertuples(index=False), df["text"]):
        words = re.findall(r"[a-z0-9]+", text.lower())
        assert decode(row.tokens) == "".join(words)
        assert row.n_tok == len(row.tokens)
    # at least one multi-char merge actually used
    assert any(int(i) >= 256 for row in enc.itertuples(index=False)
               for i in row.tokens)


def test_vocab_coverage_monotone_and_exact(ray_session):
    """Coverage sweep: monotone non-decreasing in size, exact at
    size >= vocab (coverage 1.0), matches a brute-force recompute."""
    from collections import Counter
    import re

    from parquet_hs_ray.pipelines.tokenize import vocab_coverage

    docs = _docs(["a a a b b c", "b c d", "", "a e"])
    out = vocab_coverage(docs, sizes=[1, 2, 100])
    wc = Counter(w for t in ["a a a b b c", "b c d", "", "a e"]
                 for w in re.findall(r"[a-z0-9]+", t))
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(wc.values())
    for _, row in out.iterrows():
        cov = sum(n for _, n in ranked[:int(row["size"])])
        assert row["n_covered"] == cov and row["n_total"] == total
        assert row["coverage"] == cov / total
    assert out["coverage"].is_monotonic_increasing
    assert out["coverage"].iloc[-1] == 1.0


def test_remap_tokens_by_frequency_rank_and_inverse(ray_session):
    """Frequency-rank compaction: the most frequent token becomes id 0,
    ranks follow (count desc, old-id asc), the rewrite is invertible,
    row order / other columns / list value type are preserved, and
    empty + null lists survive."""
    import collections

    import ray.data

    from parquet_hs_ray.pipelines.tokenize import remap_tokens_by_frequency

    toks = [[7, 7, 3, 9], [3, 7], [], None, [9, 9, 9, 7]]
    t = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d", "e"]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "n_tok": pa.array([4, 2, 0, 0, 4], pa.int64()),
    })
    out_t = pa.concat_tables(
        remap_tokens_by_frequency(ray.data.from_arrow(t))
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    out = pd.DataFrame({
        "doc_id": out_t["doc_id"].to_pylist(),
        "tokens": out_t["tokens"].to_pylist(),
        "n_tok": out_t["n_tok"].to_pylist(),
    }).set_index("doc_id").loc[["a", "b", "c", "d", "e"]]
    # counts: 7 -> 4x, 9 -> 4x, 3 -> 2x  =>  ranks 7->0, 9->1, 3->2
    lut = {7: 0, 9: 1, 3: 2}
    got = [None if x is None else list(x) for x in out["tokens"]]
    want = [None if x is None else [lut[v] for v in x] for x in toks]
    assert got == want
    assert list(out["n_tok"]) == [4, 2, 0, 0, 4]

    # corpus-level: remapped ids are a bijection of the old ids with
    # identical multiplicity profile
    flat_old = [v for x in toks if x for v in x]
    flat_new = [v for x in got if x for v in x]
    assert (sorted(collections.Counter(flat_old).values())
            == sorted(collections.Counter(flat_new).values()))


def test_remap_tokens_shrinks_bitpack_width(ray_session):
    """The compaction's purpose: a sparse-huge-id corpus must re-encode
    smaller after remap (ids become 0..V-1, so FOR/bit-pack widths
    collapse)."""
    import ray.data

    from parquet_hs_ray.format import encode_table
    from parquet_hs_ray.pipelines.tokenize import remap_tokens_by_frequency

    rng = np.random.default_rng(7)
    ids = rng.choice(np.int64(2) ** 40, size=64, replace=False)
    toks = [ids[rng.integers(0, 64, size=100)].tolist() for _ in range(50)]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(50)]),
        "tokens": pa.array(toks, pa.list_(pa.int64())),
    })
    before = len(encode_table(t)[0])
    remapped = pa.concat_tables(
        remap_tokens_by_frequency(ray.data.from_arrow(t))
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    after = len(encode_table(remapped)[0])
    assert after < before
    assert pa.compute.max(remapped["tokens"].combine_chunks().flatten()).as_py() == 63


def test_bigram_surprisal_tokens_matches_bruteforce(ray_session):
    """Distributed bigram scoring (partial-agg + composite-key joins)
    must equal a driver recompute with exact Python-int bit_length math;
    docs with < 2 tokens appear with zeros."""
    from collections import Counter

    from parquet_hs_ray.pipelines.tokenize import bigram_surprisal_tokens

    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 12, size=rng.integers(0, 30)).tolist()
            for _ in range(60)]
    toks += [[], [7]]
    t = pa.table({
        "doc_id": pa.array([f"d{i:03d}" for i in range(len(toks))]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t)
    out = (bigram_surprisal_tokens(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    cnt = Counter()
    for seq in toks:
        for a, b in zip(seq[:-1], seq[1:]):
            cnt[(a, b)] += 1
    cp = Counter()
    for (a, _), n in cnt.items():
        cp[a] += n
    D = len(cnt)
    sv = {k: ((cp[k[0]] + D) // (n + 1)).bit_length() - 1
          for k, n in cnt.items()}
    ref_rows = []
    for i, seq in enumerate(toks):
        pairs = list(zip(seq[:-1], seq[1:]))
        ref_rows.append((f"d{i:03d}", len(pairs),
                         sum(sv[p] for p in pairs)))
    ref = (pd.DataFrame(ref_rows,
                        columns=["doc_id", "n_bigrams", "surprisal_sum"])
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"n_bigrams": np.int64, "surprisal_sum": np.int64}), ref)
