"""Corpus-cleaning (scrub / line-dedup / decontaminate) and exact
grouped-quantile operator tests at sf0.001 plus hand-built edge cases."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_scrub_patterns_sequential_semantics(ray_session):
    """Rule 2 is counted against rule 1's OUTPUT (sequential), and the
    redaction counter sums every rule's hits."""
    import ray.data

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "call 555-1234 or 555-9999 now"},
        {"doc_id": 2, "text": "no secrets here"},
        {"doc_id": 3, "text": None},
    ])
    from parquet_hs_ray.pipelines.cleaning import scrub_patterns

    out = (scrub_patterns(ds, [(r"\d{3}-\d{4}", "<PHONE>"),
                               (r"<PHONE>( or <PHONE>)?", "<CONTACT>")])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "text"] == "call <CONTACT> now"
    # 2 phone hits + 1 contact hit on the already-scrubbed text
    assert out.loc[0, "n_redactions"] == 3
    assert out.loc[1, "n_redactions"] == 0
    assert out.loc[2, "text"] == "" and out.loc[2, "n_redactions"] == 0


def test_line_dedup_first_occurrence_wins(ray_session):
    import ray.data

    ds = ray.data.from_items([
        {"doc_id": 10, "text": "alpha\nshared line\nbeta"},
        {"doc_id": 20, "text": "shared line\ngamma\nshared line"},
    ])
    from parquet_hs_ray.pipelines.cleaning import line_dedup

    out = (line_dedup(ds).to_pandas()
           .sort_values(["doc_id", "line_no"]).reset_index(drop=True))
    kept = list(zip(out["doc_id"], out["line_no"], out["line"]))
    # "shared line" survives only at its first (doc_id, line_no) slot
    assert (10, 1, "shared line") in kept
    assert not any(l == "shared line" and (d, n) != (10, 1) for d, n, l in kept)
    assert {l for _, _, l in kept} == {"alpha", "shared line", "beta", "gamma"}


def test_line_dedup_corpus_counts(docs):
    """Survivor multiset == distinct lines; each survivor is the global
    first occurrence (checked against a pandas replay)."""
    from parquet_hs_ray.pipelines.cleaning import line_dedup

    out = line_dedup(docs, words_per_line=10).to_pandas()
    raw = docs.to_pandas()
    rows = []
    for did, text in zip(raw["doc_id"], raw["text"].fillna("")):
        words = text.split(" ")
        for ln in range(0, (len(words) + 9) // 10):
            rows.append((did, ln, " ".join(words[ln * 10:(ln + 1) * 10])))
    ref = pd.DataFrame(rows, columns=["doc_id", "line_no", "line"])
    ref["okey"] = ref["doc_id"] * (1 << 20) + ref["line_no"]
    ref = ref.loc[ref.groupby("line")["okey"].idxmin(),
                  ["doc_id", "line_no", "line"]]
    lhs = out.sort_values(["doc_id", "line_no"]).reset_index(drop=True)
    rhs = ref.sort_values(["doc_id", "line_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)


def test_decontaminate_planted_leak(ray_session):
    """A corpus doc containing a benchmark passage verbatim scores
    n_shared >= its shingle overlap; clean docs score 0."""
    import ray.data

    passage = "the capital of france is paris and it is beautiful"
    bench = ray.data.from_items([{"doc_id": 100, "text": passage}])
    corpus = ray.data.from_items([
        {"doc_id": 1, "text": "prefix words here " + passage + " suffix words"},
        {"doc_id": 2, "text": "entirely unrelated content about databases and storage"},
    ])
    from parquet_hs_ray.pipelines.cleaning import decontaminate

    out = (decontaminate(corpus, bench, ngram=3).to_pandas()
           .set_index("doc_id")["n_shared"])
    assert out[1] >= 8  # 10-word passage -> 8 distinct 3-gram shingles
    assert out[2] == 0


def test_decontaminate_bloom_one_sided(ray_session):
    """Bloom variant: NEVER undercounts the exact answer (one-sided
    error), matches it exactly at the default filter size on a small
    benchmark, and a deliberately tiny filter overcounts but still never
    undercounts."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import decontaminate, decontaminate_bloom

    passage = "the capital of france is paris and it is beautiful"
    bench = ray.data.from_items([{"doc_id": 100, "text": passage}])
    corpus = ray.data.from_items([
        {"doc_id": 1, "text": "prefix words here " + passage + " suffix words"},
        {"doc_id": 2, "text": "entirely unrelated content about databases and storage"},
        {"doc_id": 3, "text": "more clean filler text with many different words in it"},
    ])
    exact = (decontaminate(corpus, bench, ngram=3).to_pandas()
             .set_index("doc_id")["n_shared"].sort_index())
    approx = (decontaminate_bloom(corpus, bench, ngram=3).to_pandas()
              .set_index("doc_id")["n_shared_bloom"].sort_index())
    # default 1 MiB filter on ~10 shingles: no false positives expected
    assert (approx == exact).all(), (approx, exact)

    # 64-bit filter with k=2: saturated, heavy FPs — still one-sided
    tiny = (decontaminate_bloom(corpus, bench, ngram=3, m_bits=64, k=2)
            .to_pandas().set_index("doc_id")["n_shared_bloom"].sort_index())
    assert (tiny >= exact).all(), (tiny, exact)

    # non-power-of-two m_bits: clear driver-side error, not an
    # out-of-range scatter inside a Ray task
    import pytest

    with pytest.raises(ValueError, match="power of two"):
        decontaminate_bloom(corpus, bench, m_bits=100)


def test_decontaminate_bloom_multiblock_bench(ray_session):
    """Regression: every per-block partial bitset must be OR-merged —
    indexing only row 0 of each coalesced iter_batches batch dropped all
    but one bench block's shingles and broke the one-sided guarantee."""
    import pandas as pd
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import decontaminate, decontaminate_bloom

    passages = [f"unique passage number {i} about topic {i} with shared words {i}"
                for i in range(8)]
    # 8 bench blocks -> 8 one-row partial bitsets coalesced into ONE batch
    bench = ray.data.from_pandas(
        [pd.DataFrame({"doc_id": [100 + i], "text": [passages[i]]})
         for i in range(8)])
    corpus = ray.data.from_items(
        [{"doc_id": i, "text": "prefix " + passages[i] + " suffix"}
         for i in range(8)])
    exact = (decontaminate(corpus, bench, ngram=3).to_pandas()
             .set_index("doc_id")["n_shared"].sort_index())
    approx = (decontaminate_bloom(corpus, bench, ngram=3).to_pandas()
              .set_index("doc_id")["n_shared_bloom"].sort_index())
    assert (exact > 0).all()           # every corpus doc leaks its passage
    assert (approx >= exact).all(), (approx, exact)  # one-sided, no drops


def test_grouped_quantiles_matches_numpy(ray_session):
    """Exact quantile_disc rule (1-based rank ceil(q*n)) per group, on a
    skewed multi-block input."""
    import ray.data

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 3000),
        "v": rng.integers(-50, 50, 3000).astype(np.int64),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 300] for i in range(0, 3000, 300)])
    from parquet_hs_ray.pipelines.stats import grouped_quantiles

    out = (grouped_quantiles(ds, "k", "v", (0.25, 0.5, 0.95)).to_pandas()
           .sort_values("k").reset_index(drop=True))
    for _, row in out.iterrows():
        vals = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
        for q, name in [(0.25, "p25"), (0.5, "p50"), (0.95, "p95")]:
            rank = max(1, int(np.ceil(q * len(vals))))
            assert row[name] == vals[rank - 1], (row["k"], name)


def test_chunk_documents_coverage_and_overlap(ray_session):
    """Every word position is covered; consecutive chunks share exactly
    `overlap` words; reassembling chunk 0's stride-prefixes + the last
    chunk reconstructs the document."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import chunk_documents

    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{rng.integers(0, 99)}" for _ in range(n))
             for n in (1, 7, 8, 9, 31, 32, 33, 100)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:]])
    out = (chunk_documents(ds, max_words=8, overlap=3).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    stride = 5
    for did, g in out.groupby("doc_id"):
        words = df.loc[df["doc_id"] == did, "text"].iloc[0].split(" ")
        n = len(words)
        assert g["chunk_id"].tolist() == list(range(len(g)))
        assert len(g) == max(1, -(-(n - 3) // stride))
        for _, row in g.iterrows():
            s = row["chunk_id"] * stride
            assert row["text"] == " ".join(words[s:s + 8])
            assert row["n_words"] == min(8, n - s)
        # full coverage: last chunk reaches the document end
        last = g.iloc[-1]
        assert last["chunk_id"] * stride + last["n_words"] == n


def test_chunk_documents_empty_and_null(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import chunk_documents

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["", None]})
    out = (chunk_documents(ray.data.from_pandas(df), max_words=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # split(' ') of "" is [""]: one empty chunk each, like string_split
    assert out["chunk_id"].tolist() == [0, 0]
    assert out["text"].tolist() == ["", ""]
    assert out["n_words"].tolist() == [1, 1]


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import chunk_documents

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, max_words=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(ds, max_words=4, overlap=-1)


def test_clean_corpus_recipe(ray_session):
    """Composed pipeline (length filter -> denylist -> exact dedup ->
    token stats) equals the step-by-step pandas twin."""
    import duckdb
    import ray.data

    from parquet_hs_ray.pipelines.recipes import clean_corpus

    rng = np.random.default_rng(9)
    texts = [f"doc {i} " + "word " * rng.integers(1, 30) for i in range(200)]
    texts[50] = texts[51] = texts[52]      # planted exact dups
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts,
                       "source": np.where(np.arange(200) % 2 == 0, "a", "b"),
                       "n_chars": [len(t) for t in texts]})
    docs = ray.data.from_pandas([df.iloc[i:i + 40] for i in range(0, 200, 40)])
    deny = ray.data.from_pandas(df[df["doc_id"] % 7 == 0][["doc_id"]])
    out = (clean_corpus(docs, deny, quality_q=0.25).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    thr = duckdb.sql("SELECT quantile_disc(n_chars, 0.25) FROM df").fetchone()[0]
    kept = df[(df["n_chars"] >= thr) & (df["doc_id"] % 7 != 0)]
    firsts = kept.groupby("text", sort=False)["doc_id"].min()
    surv = kept[kept["doc_id"].isin(firsts.values)].copy()
    surv["n_ws_tokens"] = [len(t.split()) for t in surv["text"]]
    exp = (surv[["doc_id", "source", "n_ws_tokens"]]
           .sort_values("doc_id").reset_index(drop=True)
           .astype({"n_ws_tokens": np.int64}))
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)
    # the planted duplicates collapsed to one survivor
    assert len(set(surv["text"])) == len(surv)


def test_repetition_stats_planted(ray_session):
    """Gopher repetition filter: a doc that is one phrase looped must be
    flagged; a doc of distinct words must not; short/empty docs get
    all-zero stats and are never flagged."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import repetition_stats

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["spam ham " * 50,          # looped phrase -> repetitive
                 " ".join(f"w{i}" for i in range(100)),  # all distinct
                 "one",                      # 1 word -> zero bigrams
                 ""],                        # empty -> zero bigrams
    })
    docs["text"] = docs["text"].str.strip()
    out = (repetition_stats(ray.data.from_pandas(docs), ngram=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "repetitive"] and not out.loc[1:, "repetitive"].any()
    # looped doc: 99 bigrams, only 3 distinct ("spam ham"/"ham spam")
    assert out.loc[0, "n_grams"] == 99 and out.loc[0, "n_distinct"] == 2
    assert out.loc[0, "top_count"] == 50
    assert out.loc[1, "n_grams"] == 99 == out.loc[1, "n_distinct"]
    assert (out.loc[2:, ["n_grams", "n_distinct", "top_count"]] == 0).all().all()


def test_repetition_stats_unigram_and_validation(ray_session):
    import pytest
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import repetition_stats

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["a a a b"]}))
    out = repetition_stats(docs, ngram=1).to_pandas()
    assert out.loc[0, "n_grams"] == 4 and out.loc[0, "n_distinct"] == 2
    assert out.loc[0, "top_count"] == 3 and bool(out.loc[0, "repetitive"])
    with pytest.raises(ValueError):
        repetition_stats(docs, ngram=0)


def test_span_dedup_planted(ray_session):
    """Cross-document span dedup: a 6-word phrase planted in docs 0 and 2
    marks exactly its window positions; unique docs stay clean; a doc
    repeating ITS OWN phrase (no other doc has it) is NOT cross-flagged."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup

    phrase = "the quick brown fox jumps over"
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            f"alpha beta {phrase} gamma delta",       # shares phrase w/ doc 2
            " ".join(f"u{i}" for i in range(12)),      # unique
            f"start {phrase} end",                     # shares phrase w/ doc 0
            "self self self self self self",           # in-doc repeat only
            "tiny",                                    # shorter than window
        ],
    })
    out = (span_dedup(ray.data.from_pandas([docs.iloc[:3], docs.iloc[3:]]),
                      window=6)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_spans"].tolist() == [5, 7, 3, 1, 0]
    # only the 6-word window equal to the phrase itself is shared
    assert out["n_shared_spans"].tolist() == [1, 0, 1, 0, 0]
    assert out["has_cross_dup"].tolist() == [True, False, True, False, False]


def test_span_dedup_validation_and_empty(ray_session):
    import pytest
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0], dtype=np.int64), "text": [""]}))
    out = span_dedup(docs, window=3).to_pandas()
    assert out["n_spans"].tolist() == [0] and not out["has_cross_dup"].any()
    with pytest.raises(ValueError):
        span_dedup(docs, window=0)


def test_extract_json_field_edge_cases(ray_session):
    """->> parity on flat objects: quoted strings lose quotes, numbers
    pass through, missing keys / JSON null / unparseable -> NULL."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import extract_json_field

    df = pd.DataFrame({
        "event_id": list(range(7)),
        "props": ['{"k": 87}', '{"k": "hello"}', '{"other": 1}',
                  '{"k": null}', None, '{"k": -3, "j": 1}', 'not json'],
    })
    ds = ray.data.from_pandas(df)
    out = (extract_json_field(ds, "props", "k", id_cols=["event_id"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out["k"].tolist()[:2] == ["87", "hello"]
    assert out["k"].isna().tolist() == [False, False, True, True, True, False, True]
    assert out["k"].iloc[5] == "-3"

    out_i = (extract_json_field(ds, "props", "k", as_int=True,
                                id_cols=["event_id"])
             .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out_i["k"].iloc[0] == 87 and out_i["k"].iloc[5] == -3
    assert out_i["k"].isna().iloc[1]  # non-numeric string -> NULL under cast

    # QUOTED "null" is the three-letter string (->> parity), not NULL
    ds2 = ray.data.from_pandas(pd.DataFrame(
        {"event_id": [0], "props": ['{"k": "null"}']}))
    o2 = extract_json_field(ds2, "props", "k", id_cols=["event_id"]).to_pandas()
    assert o2["k"].iloc[0] == "null"


def test_corpus_overlap_planted(ray_session):
    """Exact shingle-set overlap on a hand-built pair: corpus B repeats
    one of A's trigram runs; counts and jaccard must match brute force."""
    import ray.data

    from parquet_hs_ray.functions import sketches as sk
    from parquet_hs_ray.pipelines.cleaning import corpus_overlap

    a_df = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["alpha beta gamma delta", "x y z w v"]})
    b_df = pd.DataFrame({"doc_id": [3, 4],
                         "text": ["alpha beta gamma delta extra", "p q r"]})
    out = corpus_overlap(ray.data.from_pandas(a_df),
                         ray.data.from_pandas(b_df), ngram=3)

    def hset(df):
        s = set()
        for t in df["text"]:
            _, h = sk.word_ngram_hashes(pd.Series([t]), n=3)
            s.update(h.tolist())
        return s

    ha, hb = hset(a_df), hset(b_df)
    assert out["n_a"].iloc[0] == len(ha)
    assert out["n_b"].iloc[0] == len(hb)
    assert out["n_shared"].iloc[0] == len(ha & hb) > 0
    assert out["jaccard"].iloc[0] == len(ha & hb) / len(ha | hb)


def test_levenshtein_kernel_reference():
    from parquet_hs_ray.functions.fuzzy import levenshtein_pairs

    a = ["kitten", "flaw", "", "abc", "same"]
    b = ["sitting", "lawn", "xy", "abc", "same"]
    got = levenshtein_pairs(a, b).tolist()
    assert got == [3, 2, 2, 0, 0]


def test_fuzzy_self_pairs_banding_complete(ray_session):
    import ray.data

    from parquet_hs_ray.functions.fuzzy import levenshtein_pairs
    from parquet_hs_ray.pipelines.cleaning import fuzzy_self_pairs

    # names straddling a band boundary (lengths 7 and 8 with w=8) must
    # still pair up
    names = ["alpha_1", "alpha_12", "alpha_13", "beta", "betb", "gamma"]
    ds = ray.data.from_pandas(pd.DataFrame({"n": names}))
    out = (fuzzy_self_pairs(ds, "n", max_dist=2, band_width=8).to_pandas()
           .sort_values(["name_a", "name_b"]).reset_index(drop=True))
    # exhaustive reference
    exp = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = sorted((names[i], names[j]))
            d = int(levenshtein_pairs([a], [b])[0])
            if d <= 2:
                exp.append((a, b, d))
    exp = sorted(exp)
    assert list(map(tuple, out[["name_a", "name_b", "dist"]].to_numpy())) == exp
    # the boundary-straddling pair is present
    assert ("alpha_1", "alpha_12", 1) in exp


def test_fuzzy_self_pairs_band_cap_raises(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import fuzzy_self_pairs

    names = [f"x{i:02d}" for i in range(50)]
    ds = ray.data.from_pandas(pd.DataFrame({"n": names}))
    with pytest.raises(Exception, match="band holds"):
        fuzzy_self_pairs(ds, "n", max_dist=1, band_width=8,
                         max_band_rows=10).to_pandas()


def test_extract_pattern_first_match_and_empty(ray_session):
    """First capture wins, no-match rows get '' (DuckDB semantics), and
    multi-group patterns are rejected up front."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import extract_pattern

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["big table small table", "no match here",
                                "x table"]})
    ds = ray.data.from_pandas(df)
    out = (extract_pattern(ds, "text", r"(\w+) table", "w",
                           id_cols=["doc_id"])
           .to_pandas().sort_values("doc_id"))
    assert out["w"].tolist() == ["big", "", "x"]
    with pytest.raises(ValueError, match="capture group"):
        extract_pattern(ds, "text", r"(\w+) (table)")


def test_span_dedup_rewrite_planted(ray_session):
    """ExactSubstr removal: a duplicated sentence survives only at its
    first (doc_id, pos) occurrence; within-doc repeats drop too;
    overlapping duplicate spans merge their coverage; short docs pass
    through whole."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup_rewrite

    sent = "the quick brown fox jumps"          # exactly window=5 words
    rows = [
        {"doc_id": 1, "text": f"alpha beta {sent} gamma delta"},
        {"doc_id": 2, "text": f"intro words here {sent} outro tail"},
        # within-doc repeat: second copy must drop
        {"doc_id": 3, "text": f"{sent} filler one two three {sent}"},
        {"doc_id": 4, "text": "too short"},
        {"doc_id": 5, "text": ""},
    ]
    out = (span_dedup_rewrite(ray.data.from_pandas(pd.DataFrame(rows)),
                              window=5).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 1 holds the canonical (min okey) occurrence: untouched
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[1, "text_clean"] == f"alpha beta {sent} gamma delta"
    # doc 2's copy is removed, surrounding words survive
    assert out.loc[2, "n_removed"] == 5
    assert out.loc[2, "text_clean"] == "intro words here outro tail"
    # doc 3: first in-doc copy removed too (doc 1 is canonical), so both go
    assert out.loc[3, "n_removed"] == 10
    assert out.loc[3, "text_clean"] == "filler one two three"
    assert out.loc[4, "n_removed"] == 0
    assert out.loc[4, "text_clean"] == "too short"
    assert out.loc[5, "n_words"] == 0 and out.loc[5, "text_clean"] == ""


def test_span_dedup_rewrite_overlap_merge(ray_session):
    """Two overlapping duplicate spans cover their union, not 2x window
    words; the canonical doc keeps everything."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup_rewrite

    six = "w1 w2 w3 w4 w5 w6"   # 6 words -> two overlapping 5-spans
    rows = [
        {"doc_id": 10, "text": f"{six} pad"},
        {"doc_id": 11, "text": f"lead {six}"},
    ]
    out = (span_dedup_rewrite(ray.data.from_pandas(pd.DataFrame(rows)),
                              window=5).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[10, "n_removed"] == 0
    # doc 11: both 5-spans of the 6-word run are duplicates of doc 10's;
    # union coverage = 6 words, not 10
    assert out.loc[11, "n_removed"] == 6
    assert out.loc[11, "text_clean"] == "lead"


def test_span_dedup_rewrite_no_dups_passthrough(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup_rewrite

    rows = [{"doc_id": i,
             "text": f"a{i} b{i} c{i} d{i} e{i} f{i} g{i}"}
            for i in range(6)]
    out = (span_dedup_rewrite(ray.data.from_pandas(pd.DataFrame(rows)),
                              window=5).to_pandas())
    assert (out["n_removed"] == 0).all()
    assert len(out) == 6


def test_span_dedup_rewrite_tokens_planted(ray_session):
    """Token-native ExactSubstr: the duplicated 5-token run survives only
    in the doc with the smallest order key; value type is preserved."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup_rewrite_tokens

    run = [11, 22, 33, 44, 55]
    toks = [
        [1, 2] + run + [3],          # dk 0: canonical
        [9] + run + [8, 7],          # dk 1: run removed
        [5, 6, 7],                   # untouched
        [],
    ]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(4)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "dk": pa.array(list(range(4)), pa.int64()),
    })
    out = pa.concat_tables(
        span_dedup_rewrite_tokens(ray.data.from_arrow(t), window=5)
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    got = dict(zip(out["doc_id"].to_pylist(), out["tokens"].to_pylist()))
    nrm = dict(zip(out["doc_id"].to_pylist(), out["n_removed"].to_pylist()))
    assert got["d0"] == toks[0] and nrm["d0"] == 0
    assert got["d1"] == [9, 8, 7] and nrm["d1"] == 5
    assert got["d2"] == [5, 6, 7] and nrm["d2"] == 0
    assert got["d3"] == [] and nrm["d3"] == 0
    assert out["tokens"].type.value_type == pa.int32()
    assert out["n_tok"].to_pylist() == [len(got[f"d{i}"]) for i in range(4)]


def test_span_dedup_rewrite_tokens_null_sequences(ray_session):
    """Null token lists survive as NULL (not empty lists): pack_tok
    carries a validity column and rebuild applies it as the list mask —
    the ADVICE-r3 regression (nulls used to come back as [])."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import span_dedup_rewrite_tokens

    run = [11, 22, 33, 44, 55]
    toks = [
        [1, 2] + run + [3],
        None,                        # null sequence, must stay null
        [9] + run + [8, 7],
        [],                          # empty list, must stay []
    ]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(4)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "dk": pa.array(list(range(4)), pa.int64()),
    })
    out = pa.concat_tables(
        span_dedup_rewrite_tokens(ray.data.from_arrow(t), window=5)
        .iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    got = dict(zip(out["doc_id"].to_pylist(), out["tokens"].to_pylist()))
    ntk = dict(zip(out["doc_id"].to_pylist(), out["n_tok"].to_pylist()))
    assert got["d0"] == toks[0]
    assert got["d1"] is None and ntk["d1"] is None
    assert got["d2"] == [9, 8, 7]
    assert got["d3"] == [] and ntk["d3"] == 0


def test_repetition_stats_tokens_planted(ray_session):
    """Token-native Gopher repetition: a sequence that is one bigram
    repeated flags repetitive; a distinct sequence doesn't; empties are
    all-zero."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import repetition_stats_tokens

    toks = [
        [1, 2] * 10,                  # 19 bigrams, 2 distinct -> repetitive
        list(range(20)),              # all distinct
        [],
        [5],                          # under the window
    ]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(4)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    out = (repetition_stats_tokens(ray.data.from_arrow(t), ngram=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc["d0", "n_grams"] == 19
    assert out.loc["d0", "n_distinct"] == 2
    assert out.loc["d0", "top_count"] == 10
    assert bool(out.loc["d0", "repetitive"])
    assert out.loc["d1", "n_distinct"] == 19
    assert not bool(out.loc["d1", "repetitive"])
    assert (out.loc[["d2", "d3"], ["n_grams", "n_distinct", "top_count"]]
            .to_numpy() == 0).all()


def test_ngram_novelty_tokens_planted(ray_session):
    """Cross-doc novelty: a trigram run shared by two docs counts as
    common in BOTH; within-doc repeats don't inflate df; doc-less grams
    and gram-less docs come back zero."""
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import ngram_novelty_tokens

    toks = [
        [1, 2, 3, 4],          # grams (1,2,3),(2,3,4); (1,2,3) shared w/ d1
        [1, 2, 3, 9],          # grams (1,2,3),(2,3,9)
        [7, 7, 7, 7, 7],       # (7,7,7) x3 occurrences but ONE distinct,
                               # unique to this doc -> common 0
        [],
        [5, 6],                # under the window
    ]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(5)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    out = (ngram_novelty_tokens(ray.data.from_arrow(t), ngram=3,
                                common_df=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc["d0", "n_distinct"] == 2 and out.loc["d0", "n_common"] == 1
    assert out.loc["d1", "n_distinct"] == 2 and out.loc["d1", "n_common"] == 1
    assert out.loc["d2", "n_distinct"] == 1 and out.loc["d2", "n_common"] == 0
    assert (out.loc[["d3", "d4"], ["n_distinct", "n_common"]]
            .to_numpy() == 0).all()


def test_ngram_novelty_tokens_layout_independent(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import ngram_novelty_tokens

    rng = np.random.default_rng(31)
    toks = [rng.integers(0, 50, int(rng.integers(0, 20))).tolist()
            for _ in range(120)]
    t = pa.table({
        "doc_id": pa.array([f"d{i:03d}" for i in range(120)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    a = (ngram_novelty_tokens(ray.data.from_arrow(t))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    parts = [t.slice(i, 1) for i in range(t.num_rows)]
    b = (ngram_novelty_tokens(ray.data.from_arrow_refs(
        [ray.put(pa.concat_tables(parts[i::7])) for i in range(7)]))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_all_pairs_block_ceiling(ray_session):
    """The exact all-pairs twins refuse past the block cap with a
    pointer to the sub-quadratic path; an explicit max_blocks override
    allows the run (r3 verdict #7)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from parquet_hs_ray.pipelines.dedup import (
        dedup_jaccard,
        embedding_neardup_pairs,
    )

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"alpha beta gamma delta {i}" for i in range(40)],
    }))
    # rows_per_block=4 -> 10 blocks > cap 2
    with pytest.raises(ValueError, match="dedup_minhash"):
        dedup_jaccard(docs, rows_per_block=4, max_blocks=2)
    out = dedup_jaccard(docs, rows_per_block=4, max_blocks=64)
    assert isinstance(out, pd.DataFrame)

    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(24, dtype=np.int64),
        "embedding": [list(np.eye(4)[i % 4]) for i in range(24)],
    }))
    with pytest.raises(ValueError, match="ivf"):
        embedding_neardup_pairs(emb, rows_per_block=4, max_blocks=2)
