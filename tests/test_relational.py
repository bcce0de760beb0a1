"""Relational operator tests: broadcast join (inner/left/semi/anti),
per-group top-n (ties, small groups), percentile filtering (rank rule,
empty input)."""

import numpy as np
import pandas as pd
import pytest
import ray.data


@pytest.fixture(scope="module")
def fact_dim(ray_session):
    """Multi-block fact table + small dimension with some unmatched keys
    on both sides."""
    import ray.data

    rng = np.random.default_rng(7)
    fact = pd.DataFrame({
        "fk": rng.integers(0, 40, 3000),          # dim covers only 0..29
        "grp": rng.integers(0, 12, 3000),
        "score": np.round(rng.uniform(0, 100, 3000), 1),
        "rid": np.arange(3000, dtype=np.int64),
    })
    dim = pd.DataFrame({
        "dk": np.arange(30, dtype=np.int64),
        "label": [f"L{i}" for i in range(30)],
        "weight": np.linspace(0.5, 2.0, 30),
    })
    ds = ray.data.from_pandas([fact.iloc[i:i + 200] for i in range(0, 3000, 200)])
    return fact, dim, ds, ray.data.from_pandas(dim)


def _sorted(df, cols=None):
    cols = cols or list(df.columns)
    return df.sort_values(cols).reset_index(drop=True)[sorted(df.columns)]


def test_broadcast_join_inner(fact_dim):
    from parquet_hs_ray.pipelines.relational import broadcast_join

    fact, dim, ds, dimds = fact_dim
    out = broadcast_join(ds, dimds, "fk", "dk", how="inner",
                         right_cols=["label", "weight"]).to_pandas()
    exp = fact.merge(dim, left_on="fk", right_on="dk").drop(columns=["dk"])
    pd.testing.assert_frame_equal(_sorted(out), _sorted(exp))


def test_broadcast_join_left_keeps_unmatched(fact_dim):
    from parquet_hs_ray.pipelines.relational import broadcast_join

    fact, dim, ds, dimds = fact_dim
    out = broadcast_join(ds, dimds, "fk", "dk", how="left",
                         right_cols=["label"]).to_pandas()
    assert len(out) == len(fact)
    unmatched = out[out["fk"] >= 30]
    assert len(unmatched) and unmatched["label"].isna().all()


def test_broadcast_join_semi_anti_partition(fact_dim):
    from parquet_hs_ray.pipelines.relational import broadcast_join

    fact, dim, ds, dimds = fact_dim
    semi = broadcast_join(ds, dimds, "fk", "dk", how="semi").to_pandas()
    anti = broadcast_join(ds, dimds, "fk", "dk", how="anti").to_pandas()
    # semi + anti partition the fact table exactly
    assert len(semi) + len(anti) == len(fact)
    assert (semi["fk"] < 30).all() and (anti["fk"] >= 30).all()
    both = pd.concat([semi, anti], ignore_index=True)
    pd.testing.assert_frame_equal(_sorted(both), _sorted(fact))


def test_broadcast_join_empty_small_side(fact_dim, ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.relational import broadcast_join

    fact, dim, ds, _ = fact_dim
    empty = ray.data.from_pandas(dim.iloc[:0])
    assert broadcast_join(ds, empty, "fk", "dk", how="semi").count() == 0
    assert broadcast_join(ds, empty, "fk", "dk", how="anti").count() == len(fact)


def test_broadcast_join_rejects_unknown_how(fact_dim):
    from parquet_hs_ray.pipelines.relational import broadcast_join

    _, _, ds, dimds = fact_dim
    with pytest.raises(ValueError):
        broadcast_join(ds, dimds, "fk", "dk", how="outer")


def test_top_n_per_group_matches_window(fact_dim):
    from parquet_hs_ray.pipelines.relational import top_n_per_group

    fact, _, ds, _ = fact_dim
    out = top_n_per_group(ds, "grp", "score", 5, "rid",
                          columns=["grp", "score", "rid"]).to_pandas()
    rn = (fact.sort_values(["score", "rid"], ascending=[False, True],
                           kind="mergesort")
          .groupby("grp").cumcount())
    exp = fact.loc[rn < 5, ["grp", "score", "rid"]]
    pd.testing.assert_frame_equal(_sorted(out), _sorted(exp))


def test_top_n_per_group_ties_and_small_groups(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.relational import top_n_per_group

    # every score tied -> selection is decided purely by the tiebreak;
    # group 1 has fewer rows than n
    df = pd.DataFrame({"g": [0] * 6 + [1] * 2,
                       "s": [7.0] * 8,
                       "id": np.arange(8, dtype=np.int64)})
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:5], df.iloc[5:]])
    out = top_n_per_group(ds, "g", "s", 4, "id").to_pandas()
    got = out.sort_values(["g", "id"]).reset_index(drop=True)
    assert got[got["g"] == 0]["id"].tolist() == [0, 1, 2, 3]  # lowest ids win ties
    assert got[got["g"] == 1]["id"].tolist() == [6, 7]        # whole small group


def test_filter_by_percentile_rank_rule(ray_session):
    import duckdb
    import ray.data

    from parquet_hs_ray.pipelines.relational import filter_by_percentile

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"v": rng.integers(0, 50, 997).astype(np.int64),
                       "id": np.arange(997, dtype=np.int64)})
    ds = ray.data.from_pandas([df.iloc[i:i + 100] for i in range(0, 997, 100)])
    for q, keep in ((0.8, "above"), (0.25, "below")):
        out = filter_by_percentile(ds, "v", q, keep=keep).to_pandas()
        thr = duckdb.sql(
            f"SELECT quantile_disc(v, {q}) FROM df").fetchone()[0]
        exp = df[df["v"] >= thr] if keep == "above" else df[df["v"] < thr]
        pd.testing.assert_frame_equal(_sorted(out), _sorted(exp))


def test_filter_by_percentile_all_null(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.relational import filter_by_percentile

    df = pd.DataFrame({"v": pd.array([None, None], dtype="Float64"),
                       "id": [0, 1]})
    ds = ray.data.from_pandas(df)
    assert filter_by_percentile(ds, "v", 0.5).count() == 0


def test_filter_by_percentile_rejects_bad_keep(ray_session):
    import ray.data

    from parquet_hs_ray.pipelines.relational import filter_by_percentile

    ds = ray.data.from_pandas(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(ValueError):
        filter_by_percentile(ds, "v", 0.5, keep="between")


def test_hash_join_matches_pandas(fact_dim):
    """Large-x-large native hash-shuffle join (key renamed on the right)
    matches a pandas inner merge."""
    from parquet_hs_ray.pipelines.relational import hash_join

    fact, dim, ds, dimds = fact_dim
    out = hash_join(ds, dimds, "fk", "dk", num_partitions=4).to_pandas()
    exp = (fact.merge(dim, left_on="fk", right_on="dk")
           .drop(columns=["dk"]).rename(columns={"fk": "fk"}))
    pd.testing.assert_frame_equal(_sorted(out), _sorted(exp))


def test_sample_n_per_group_deterministic_and_capped(ray_session):
    """Same seed -> identical sample across block layouts; at most n per
    group; small groups kept whole; different seed -> different pick."""
    import ray.data

    from parquet_hs_ray.pipelines.relational import sample_n_per_group

    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], [200, 150, 3]),
        "id": np.arange(353, dtype=np.int64),
    })
    a = (sample_n_per_group(
        ray.data.from_pandas([df.iloc[i:i + 40] for i in range(0, 353, 40)]),
        "g", 25, "id", seed=42).to_pandas()
        .sort_values("id").reset_index(drop=True))
    b = (sample_n_per_group(
        ray.data.from_pandas(df), "g", 25, "id", seed=42).to_pandas()
        .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    sizes = a["g"].value_counts()
    assert sizes["a"] == 25 and sizes["b"] == 25 and sizes["c"] == 3
    c = (sample_n_per_group(ray.data.from_pandas(df), "g", 25, "id", seed=7)
         .to_pandas().sort_values("id").reset_index(drop=True))
    assert not a["id"].tolist() == c["id"].tolist()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(n_rows=st.integers(1, 400), n=st.integers(1, 12),
       seed=st.integers(0, 2**16))
def test_ntile_bucket_property(ray_session, n_rows, n, seed):
    """For any (rows, n): buckets are 1..min(n, rows), sizes differ by at
    most 1, larger buckets come first, and bucket order follows value
    order."""
    import ray.data

    from parquet_hs_ray.pipelines.stats import ntile_bucket

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"id": np.arange(n_rows, dtype=np.int64),
                       "v": rng.integers(0, 20, n_rows).astype(np.float64)})
    ds = ray.data.from_pandas([df.iloc[i:i + 97] for i in range(0, n_rows, 97)])
    out = ntile_bucket(ds, "v", n, "id").to_pandas()
    assert len(out) == n_rows
    sizes = out["bucket"].value_counts().sort_index()
    assert sizes.index.tolist() == list(range(1, min(n, n_rows) + 1))
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes.to_numpy()) <= 0).all()  # big buckets first
    srt = out.sort_values(["v", "id"])
    assert (np.diff(srt["bucket"].to_numpy()) >= 0).all()


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**16), max_words=st.integers(2, 12),
       overlap_frac=st.floats(0, 0.99))
def test_chunk_documents_property(ray_session, seed, max_words, overlap_frac):
    """For any (max_words, overlap): per-doc chunk count follows
    max(1, ceil((n-overlap)/stride)); the last chunk reaches the doc end;
    consecutive chunks advance by exactly stride."""
    import ray.data

    from parquet_hs_ray.pipelines.cleaning import chunk_documents

    overlap = int(overlap_frac * (max_words - 1))
    stride = max_words - overlap
    rng = np.random.default_rng(seed)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 40)))
             for _ in range(12)]
    df = pd.DataFrame({"doc_id": np.arange(12), "text": texts})
    ds = ray.data.from_pandas([df.iloc[:5], df.iloc[5:]])
    out = (chunk_documents(ds, max_words=max_words, overlap=overlap)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    for did, g in out.groupby("doc_id"):
        n = len(texts[did].split(" "))
        assert len(g) == max(1, -(-(n - overlap) // stride))
        last = g.iloc[-1]
        assert last["chunk_id"] * stride + last["n_words"] == n
        assert g["chunk_id"].tolist() == list(range(len(g)))


def test_top_revenue_orders_recipe(ray_session):
    """Q3-shaped recipe equals a pandas step-by-step twin on synthetic
    fact/dimension tables with revenue ties."""
    import ray.data

    from parquet_hs_ray.pipelines.recipes import top_revenue_orders

    rng = np.random.default_rng(5)
    n_ord, n_li = 60, 400
    cust = pd.DataFrame({"c_custkey": np.arange(20, dtype=np.int64),
                         "c_mktsegment": np.where(np.arange(20) % 2 == 0,
                                                  "BUILDING", "MACHINERY")})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, 20, n_ord),
        "o_orderdate": pd.to_datetime("1998-01-01")
        + pd.to_timedelta(rng.integers(0, 300, n_ord), unit="D"),
        "o_orderpriority": np.where(np.arange(n_ord) % 3 == 0, "1-URGENT", "5-LOW"),
    })
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_extendedprice": np.round(rng.uniform(100, 5000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_shipdate": pd.to_datetime("1998-01-01")
        + pd.to_timedelta(rng.integers(0, 300, n_li), unit="D"),
    })
    out = top_revenue_orders(
        ray.data.from_pandas([li.iloc[:200], li.iloc[200:]]),
        ray.data.from_pandas(orders), ray.data.from_pandas(cust),
        segment="BUILDING", cutoff="1998-06-01", k=5)

    cut = pd.Timestamp("1998-06-01")
    keep = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    of = orders[(orders["o_orderdate"] < cut) & orders["o_custkey"].isin(keep)]
    m = li[li["l_shipdate"] > cut].copy()
    m["revenue_cents"] = np.round(
        m["l_extendedprice"] * (1 - m["l_discount"]) * 100).astype(np.int64)
    rev = m.groupby("l_orderkey")["revenue_cents"].sum().reset_index()
    exp = (of.merge(rev, left_on="o_orderkey", right_on="l_orderkey")
           .sort_values(["revenue_cents", "o_orderkey"], ascending=[False, True])
           .head(5)[["o_orderkey", "revenue_cents", "o_orderdate",
                     "o_orderpriority"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype(exp.dtypes.to_dict()), exp)


def test_bloom_semi_join_exact_and_pruning(ray_session):
    """Bloom-prefiltered semi join: result equals the exact semi join
    even with a tiny (high-FP) bitset; the prefilter pass is a superset
    that actually prunes non-matching keys with a realistic m."""
    import ray.data

    from parquet_hs_ray.pipelines.relational import bloom_semi_join

    rng = np.random.default_rng(13)
    big = pd.DataFrame({"k": rng.integers(0, 10_000, 20_000),
                        "v": np.arange(20_000, dtype=np.int64)})
    dim = pd.DataFrame({"k": np.arange(0, 10_000, 97, dtype=np.int64)})
    ds_big = ray.data.from_pandas([big.iloc[i::8].reset_index(drop=True)
                                   for i in range(8)])
    ds_dim = ray.data.from_pandas(dim)
    ref = (big[big["k"].isin(set(dim["k"]))]
           .sort_values(["k", "v"]).reset_index(drop=True))

    for m_bits in (256, 1 << 20):  # tiny bitset = many FPs; verify kills them
        out = (bloom_semi_join(ds_big, ds_dim, "k", "k", m_bits=m_bits)
               .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)

    pre = (bloom_semi_join(ds_big, ds_dim, "k", "k", m_bits=1 << 20,
                           prefilter_only=True).to_pandas())
    assert len(ref) <= len(pre) < len(big)  # superset that really prunes
    assert set(ref["v"]) <= set(pre["v"])


def test_hash_join_outer_variants(fact_dim, ray_session):
    """left/right/full outer hash joins match pandas merge semantics:
    unmatched rows survive with nulls on the other side."""
    import ray.data

    from parquet_hs_ray.pipelines.relational import hash_join

    fact, dim, ds, dimds = fact_dim
    for how in ("left", "right", "full"):
        out = hash_join(ds, dimds, "fk", "dk", how=how).to_pandas()
        exp = fact.merge(dim.rename(columns={"dk": "fk"}), on="fk", how=(
            "outer" if how == "full" else how))
        assert len(out) == len(exp), how
        # unmatched fact keys (>=30) survive in left/full with null label
        if how in ("left", "full"):
            um = out[out["fk"] >= 30]
            assert len(um) and um["label"].isna().all()
        # fact has every key 0..39, so right never adds unmatched dim rows;
        # spot-check the matched payload sums agree instead
        assert out["weight"].sum() == pytest.approx(exp["weight"].sum())

    with pytest.raises(ValueError):
        hash_join(ds, dimds, "fk", "dk", how="cross")


def test_pricing_summary_matches_pandas(ray_session):
    """TPC-H-Q1 recipe vs a single-process pandas computation over a
    synthetic lineitem (includes rows past the cutoff and multi-block
    layout so the partial-agg merge is exercised)."""
    import ray.data

    from parquet_hs_ray.pipelines.recipes import pricing_summary

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "l_returnflag": rng.choice(list("ARN"), n),
        "l_linestatus": rng.choice(list("OF"), n),
        "l_quantity": rng.integers(1, 51, n).astype(float),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n), 2),
        "l_shipdate": pd.Timestamp("1998-01-01")
        + pd.to_timedelta(rng.integers(0, 400, n), unit="D"),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 500] for i in range(0, n, 500)])
    out = (pricing_summary(ds, cutoff="1998-09-01").to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True))

    m = df[df["l_shipdate"] <= pd.Timestamp("1998-09-01")].copy()
    p, d, t = (m["l_extendedprice"].to_numpy(), m["l_discount"].to_numpy(),
               m["l_tax"].to_numpy())
    m["sum_qty_c"] = np.round(m["l_quantity"].to_numpy() * 100).astype(np.int64)
    m["sum_base_c"] = np.round(p * 100).astype(np.int64)
    m["sum_disc_c"] = np.round(p * (1 - d) * 100).astype(np.int64)
    m["sum_charge_c"] = np.round(p * (1 - d) * (1 + t) * 100).astype(np.int64)
    m["sum_discount_c"] = np.round(d * 100).astype(np.int64)
    m["n_rows"] = 1
    exp = (m.groupby(["l_returnflag", "l_linestatus"], as_index=False)
           [["sum_qty_c", "sum_base_c", "sum_disc_c", "sum_charge_c",
             "sum_discount_c", "n_rows"]].sum()
           .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True))
    nn = exp["n_rows"].to_numpy().astype(float)
    exp["avg_qty"] = exp["sum_qty_c"].to_numpy() / (100.0 * nn)
    exp["avg_price"] = exp["sum_base_c"].to_numpy() / (100.0 * nn)
    exp["avg_disc"] = exp["sum_discount_c"].to_numpy() / (100.0 * nn)
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  exp[sorted(exp.columns)], check_exact=True)


# --- SQL set operations (DISTINCT semantics) and UNPIVOT -------------------

def _two_sides():
    a = pd.DataFrame({"k": [1, 2, 2, 3, 5, 7], "junk": 0})
    b = pd.DataFrame({"k": [2, 3, 3, 4, 8], "other": "x"})
    return a, b


@pytest.mark.parametrize("op,expected", [
    ("intersect", [2, 3]),
    ("except", [1, 5, 7]),
    ("union", [1, 2, 3, 4, 5, 7, 8]),
])
def test_set_op_semantics(ray_session, op, expected):
    from parquet_hs_ray.pipelines.relational import set_op

    a, b = _two_sides()
    dsa = ray.data.from_pandas([a.iloc[i::3].reset_index(drop=True) for i in range(3)])
    dsb = ray.data.from_pandas([b.iloc[i::2].reset_index(drop=True) for i in range(2)])
    out = sorted(set_op(dsa, dsb, ["k"], op).to_pandas()["k"].tolist())
    assert out == expected


def test_set_op_large_path_matches_small(ray_session):
    from parquet_hs_ray.pipelines.groupagg import grouped_agg  # noqa: F401
    from parquet_hs_ray.pipelines.relational import set_op

    rng = np.random.default_rng(3)
    a = pd.DataFrame({"k": rng.integers(0, 400, 3000)})
    b = pd.DataFrame({"k": rng.integers(200, 600, 3000)})
    dsa = ray.data.from_pandas([a.iloc[i::6].reset_index(drop=True) for i in range(6)])
    dsb = ray.data.from_pandas([b.iloc[i::6].reset_index(drop=True) for i in range(6)])
    got = sorted(set_op(dsa, dsb, ["k"], "intersect").to_pandas()["k"].tolist())
    exp = sorted(set(a["k"]) & set(b["k"]))
    assert got == exp


def test_set_op_rejects_unknown(ray_session):
    from parquet_hs_ray.pipelines.relational import set_op

    with pytest.raises(ValueError):
        set_op(ray.data.from_pandas(pd.DataFrame({"k": [1]})),
               ray.data.from_pandas(pd.DataFrame({"k": [1]})), ["k"], "minus")


def test_unpivot_matches_pandas_melt(ray_session):
    from parquet_hs_ray.pipelines.relational import unpivot

    df = pd.DataFrame({"id": [1, 2, 3], "a": [10.0, 20.0, 30.0],
                       "b": [1.5, 2.5, 3.5]})
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:].reset_index(drop=True)])
    out = (unpivot(ds, ["id"], ["a", "b"]).to_pandas()
           .sort_values(["id", "measure"]).reset_index(drop=True))
    exp = (df.melt(id_vars=["id"], value_vars=["a", "b"],
                   var_name="measure", value_name="value")
           .sort_values(["id", "measure"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_small_quantity_revenue_matches_pandas(ray_session):
    from parquet_hs_ray.pipelines.recipes import small_quantity_revenue

    rng = np.random.default_rng(21)
    li = pd.DataFrame({
        "l_partkey": rng.integers(0, 50, 2000),
        "l_quantity": rng.integers(1, 50, 2000).astype(float),
        "l_extendedprice": np.round(rng.uniform(10, 1000, 2000), 2),
    })
    ds = ray.data.from_pandas([li.iloc[i::4].reset_index(drop=True) for i in range(4)])
    out = small_quantity_revenue(ds).to_pandas()
    q_c = np.round(li["l_quantity"].to_numpy() * 100).astype(np.int64)
    p_c = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    g = pd.DataFrame({"pk": li["l_partkey"], "q_c": q_c}).groupby("pk")["q_c"]
    sq = g.sum().reindex(li["l_partkey"]).to_numpy()
    cnt = g.count().reindex(li["l_partkey"]).to_numpy()
    m = q_c * cnt * 5 < sq
    assert int(out["rev_c"].iloc[0]) == int(p_c[m].sum())
    assert int(out["n"].iloc[0]) == int(m.sum())


def test_order_count_distribution_includes_zero(ray_session):
    from parquet_hs_ray.pipelines.recipes import order_count_distribution

    cust = pd.DataFrame({"c_custkey": np.arange(10, dtype=np.int64)})
    orders = pd.DataFrame({"o_custkey": np.array([0, 0, 0, 1, 1, 2], dtype=np.int64),
                           "o_orderkey": np.arange(6)})
    out = (order_count_distribution(
        ray.data.from_pandas(cust), ray.data.from_pandas(orders))
        .to_pandas().sort_values("n_orders").reset_index(drop=True))
    exp = pd.DataFrame({"n_orders": [0, 1, 2, 3], "n_cust": [7, 1, 1, 1]})
    assert out["n_orders"].tolist() == exp["n_orders"].tolist()
    assert out["n_cust"].tolist() == exp["n_cust"].tolist()


@pytest.mark.parametrize("op,expected", [
    ("intersect", [2.0, None]),
    ("union", [1.0, 2.0, 3.0, None]),
])
def test_set_op_null_keys_sql_semantics(ray_session, op, expected):
    """SQL set ops treat NULL keys as equal: a NULL in both inputs
    survives INTERSECT (review fix: pandas groupby dropna default)."""
    from parquet_hs_ray.pipelines.relational import set_op

    a = pd.DataFrame({"k": [1.0, 2.0, np.nan]})
    b = pd.DataFrame({"k": [2.0, 3.0, np.nan]})
    out = set_op(ray.data.from_pandas(a), ray.data.from_pandas(b),
                 ["k"], op).to_pandas()["k"]
    got = sorted([None if pd.isna(v) else v for v in out],
                 key=lambda v: (v is None, v))
    assert got == sorted(expected, key=lambda v: (v is None, v))


# --- bucketed storage layout + zero-shuffle join ---------------------------

def test_bucketed_join_matches_pandas_merge(ray_session, tmp_path):
    from parquet_hs_ray.pipelines import bucketing as bk

    rng = np.random.default_rng(17)
    a = pd.DataFrame({"k": rng.integers(0, 200, 3000), "va": rng.integers(0, 9, 3000)})
    b = pd.DataFrame({"ck": np.arange(150, dtype=np.int64), "vb": np.arange(150) * 2})
    da = bk.bucket_write(ray.data.from_pandas(a), str(tmp_path / "a"), "k", 8)
    db = bk.bucket_write(ray.data.from_pandas(b), str(tmp_path / "b"), "ck", 8)
    out = (bk.bucketed_join(da, db, "k", "ck", 8).to_pandas()
           .sort_values(["k", "va", "vb"]).reset_index(drop=True))
    exp = (a.merge(b, left_on="k", right_on="ck", how="inner")
           .sort_values(["k", "va", "vb"]).reset_index(drop=True))
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(out[sorted(out.columns)], exp[sorted(exp.columns)],
                                  check_dtype=False)


def test_bucketed_join_detects_layout_drift(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_hs_ray.pipelines import bucketing as bk

    a = pd.DataFrame({"k": np.arange(50, dtype=np.int64)})
    da = bk.bucket_write(ray.data.from_pandas(a), str(tmp_path / "a"), "k", 4)
    db = bk.bucket_write(ray.data.from_pandas(a), str(tmp_path / "b"), "k", 4)
    # corrupt one bucket: move rows into the wrong directory
    wrong = pd.DataFrame({"k": np.array([0, 1, 2, 3, 4], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(wrong, preserve_index=False),
                   f"{da}/_bucket=0/poison.parquet")
    with pytest.raises(Exception, match="layout drift"):
        bk.bucketed_join(da, db, "k", "k", 4).to_pandas()


def test_bucket_of_stable():
    from parquet_hs_ray.pipelines.bucketing import bucket_of

    k = np.arange(1000, dtype=np.int64)
    b1, b2 = bucket_of(k, 16), bucket_of(k, 16)
    assert (b1 == b2).all() and b1.min() >= 0 and b1.max() < 16
    # roughly balanced (splitmix64 is a good mixer)
    counts = np.bincount(b1, minlength=16)
    assert counts.min() > 1000 / 16 * 0.5


# --- skew-mitigated join ----------------------------------------------------

def test_skew_join_planted_hot_key(ray_session):
    from parquet_hs_ray.pipelines.relational import skew_join

    rng = np.random.default_rng(19)
    n = 8000
    keys = rng.integers(0, 400, n)
    keys[: n // 2] = 7  # one key holds half the probe side
    large = pd.DataFrame({"k": keys, "v": rng.integers(0, 100, n)})
    small = pd.DataFrame({"ck": np.arange(400, dtype=np.int64),
                          "label": [f"s{i}" for i in range(400)]})
    stats = {}
    out = (skew_join(
        ray.data.from_pandas([large.iloc[i::8].reset_index(drop=True)
                              for i in range(8)]),
        ray.data.from_pandas(small), "k", "ck",
        min_share=0.01, stats_out=stats).to_pandas()
        .sort_values(["k", "v"]).reset_index(drop=True))
    exp = (large.merge(small, left_on="k", right_on="ck")
           .drop(columns=["ck"])
           .sort_values(["k", "v"]).reset_index(drop=True))
    assert 7 in stats["hot_keys"]  # the planted hot key was detected
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False)


def test_skew_join_all_hot_and_none_hot(ray_session):
    from parquet_hs_ray.pipelines.relational import skew_join

    large = pd.DataFrame({"k": np.array([1] * 50 + [2] * 50),
                          "v": np.arange(100)})
    small = pd.DataFrame({"ck": np.array([1, 2]), "label": ["a", "b"]})
    out = (skew_join(ray.data.from_pandas(large), ray.data.from_pandas(small),
                     "k", "ck", min_share=0.01).to_pandas()
           .sort_values("v").reset_index(drop=True))
    assert len(out) == 100 and set(out["label"]) == {"a", "b"}
    # none hot: threshold too high for any key
    out2 = (skew_join(ray.data.from_pandas(large), ray.data.from_pandas(small),
                      "k", "ck", min_share=0.99).to_pandas())
    assert len(out2) == 100


def test_cross_join_guard_and_product(ray_session):
    from parquet_hs_ray.pipelines.relational import cross_join

    a = pd.DataFrame({"x": [1, 2, 3]})
    b = pd.DataFrame({"y": ["u", "v"]})
    out = cross_join(ray.data.from_pandas(a), ray.data.from_pandas(b)).to_pandas()
    assert len(out) == 6 and set(out.columns) == {"x", "y"}
    big = pd.DataFrame({"y": np.arange(10)})
    with pytest.raises(ValueError, match="explode"):
        cross_join(ray.data.from_pandas(a), ray.data.from_pandas(big),
                   max_right_rows=5)


def test_unnest_ragged_and_null_lists(ray_session):
    import pyarrow as pa

    from parquet_hs_ray.pipelines.relational import unnest

    t = pa.table({"id": [1, 2, 3, 4],
                  "xs": [[10, 20], [], None, [7]]})
    out = (unnest(ray.data.from_arrow(t), "xs", ["id"]).to_pandas()
           .sort_values(["id", "idx"]).reset_index(drop=True))
    assert out["id"].tolist() == [1, 1, 4]
    assert out["value"].tolist() == [10, 20, 7]
    assert out["idx"].tolist() == [0, 1, 0]
    # index_col=None omits the position column
    out2 = unnest(ray.data.from_arrow(t), "xs", ["id"],
                  index_col=None).to_pandas()
    assert sorted(out2.columns) == ["id", "value"]


def test_collect_list_inverts_unnest(ray_session):
    import pyarrow as pa

    from parquet_hs_ray.pipelines.relational import collect_list, unnest

    rng = np.random.default_rng(29)
    lists = [rng.integers(0, 100, rng.integers(1, 9)).tolist()
             for _ in range(200)]
    t = pa.table({"id": list(range(200)), "xs": lists})
    flat = unnest(ray.data.from_arrow(t), "xs", ["id"])
    back = (collect_list(flat, "id", "value", order_col="idx",
                         out_col="xs").to_pandas()
            .sort_values("id").reset_index(drop=True))
    assert len(back) == 200
    for i in range(200):
        assert list(back["xs"].iloc[i]) == lists[back["id"].iloc[i]]


def test_collect_list_straddling_groups(ray_session):
    from parquet_hs_ray.pipelines.relational import collect_list

    # one hot key spread over many blocks must re-merge into ONE row
    df = pd.DataFrame({"k": [7] * 500 + [1, 2, 3],
                       "v": list(range(500)) + [10, 20, 30]})
    ds = ray.data.from_pandas([df.iloc[i::8].reset_index(drop=True)
                               for i in range(8)])
    out = collect_list(ds, "k", "v", order_col="v").to_pandas()
    assert len(out) == 4
    hot = out[out["k"] == 7]["values"].iloc[0]
    assert list(hot) == list(range(500))


def test_skew_join_duplicate_small_side_keys(ray_session):
    """Review fix: a hot key with SEVERAL small-side rows must produce
    one output row per (probe row, small row) pair, like the plain
    equi-join — broadcast_join's key dedup must not leak in."""
    from parquet_hs_ray.pipelines.relational import skew_join

    large = pd.DataFrame({"k": np.array([7] * 50 + [1] * 5 + [2] * 5),
                          "v": np.arange(60)})
    small = pd.DataFrame({"ck": np.array([7, 7, 1, 2]),
                          "label": ["a", "b", "c", "d"]})
    out = skew_join(
        ray.data.from_pandas([large.iloc[i::4].reset_index(drop=True)
                              for i in range(4)]),
        ray.data.from_pandas(small), "k", "ck", min_share=0.1).to_pandas()
    exp = large.merge(small, left_on="k", right_on="ck")
    assert len(out) == len(exp) == 110  # 50*2 + 5 + 5
    assert sorted(out[out["k"] == 7]["label"].unique()) == ["a", "b"]


def test_skew_join_empty_probe_side(ray_session):
    from parquet_hs_ray.pipelines.relational import skew_join

    empty = ray.data.from_pandas(pd.DataFrame(
        {"k": pd.Series([], dtype=np.int64), "v": pd.Series([], dtype=np.int64)}))
    small = ray.data.from_pandas(pd.DataFrame({"ck": [1], "label": ["a"]}))
    out = skew_join(empty, small, "k", "ck").to_pandas()
    assert len(out) == 0


def test_collect_list_null_keys_kept(ray_session):
    from parquet_hs_ray.pipelines.relational import collect_list

    df = pd.DataFrame({"k": [np.nan, np.nan, 1.0, 1.0, 2.0],
                       "v": [10, 11, 1, 2, 3]})
    out = collect_list(ray.data.from_pandas(df), "k", "v",
                       order_col="v").to_pandas()
    null_rows = out[out["k"].isna()]
    assert len(null_rows) == 1 and sorted(null_rows["values"].iloc[0]) == [10, 11]
    assert len(out) == 3


def test_bucket_of_string_keys_and_float_reject():
    from parquet_hs_ray.pipelines.bucketing import bucket_of

    b = bucket_of(np.array(["alpha", "beta", "alpha"]), 8)
    assert b[0] == b[2] and 0 <= b.min() and b.max() < 8
    with pytest.raises(TypeError, match="float|dtype"):
        bucket_of(np.array([1.5, 2.5]), 8)


def test_fuzzy_self_pairs_rejects_overlong(ray_session):
    from parquet_hs_ray.pipelines.cleaning import fuzzy_self_pairs

    ds = ray.data.from_pandas(pd.DataFrame({"n": ["x" * 100, "y"]}))
    with pytest.raises(Exception, match="max_len"):
        fuzzy_self_pairs(ds, "n", max_dist=2).to_pandas()


def test_read_any_rejects_unknown_and_mixed(ray_session, tmp_path):
    from parquet_hs_ray.sources.ingest import read_any

    (tmp_path / "a.tsv").write_text("x\t1\n")
    with pytest.raises(ValueError, match="unsupported"):
        read_any(str(tmp_path / "a.tsv"))
    with pytest.raises(ValueError, match="mixed"):
        read_any([str(tmp_path / "a.jsonl"), str(tmp_path / "b.csv")])


# --- property tests (hypothesis) --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=30)


@settings(max_examples=8, deadline=None)
@given(_keys, _keys)
def test_set_op_property_matches_python_sets(ray_session, xs, ys):
    from parquet_hs_ray.pipelines.relational import set_op

    dsa = ray.data.from_pandas(pd.DataFrame({"k": pd.Series(xs, dtype=np.int64)}))
    dsb = ray.data.from_pandas(pd.DataFrame({"k": pd.Series(ys, dtype=np.int64)}))
    sx, sy = set(xs), set(ys)
    for op, exp in (("intersect", sx & sy), ("except", sx - sy),
                    ("union", sx | sy)):
        out = set_op(dsa, dsb, ["k"], op).to_pandas()
        got = set(out["k"].tolist()) if "k" in out.columns else set()
        assert got == exp, (op, got, exp)


def test_semi_anti_join_matches_exists_semantics(ray_session):
    """semi/anti vs python EXISTS over dup keys and NULL keys on both
    sides: NULL left keys never match (anti keeps, semi drops); dup
    right keys count once; row multiplicity of the left is preserved."""
    from parquet_hs_ray.pipelines.relational import semi_anti_join

    left = pd.DataFrame({
        "k": pd.array([1, 2, 2, 3, None, 5, None, 7], dtype="Int64"),
        "v": np.arange(8, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": pd.array([2, 2, 3, None, 9], dtype="Int64"),
        "junk": ["a", "b", "c", "d", "e"]})
    lds = ray.data.from_pandas([left.iloc[:4], left.iloc[4:]])
    rds = ray.data.from_pandas([right.iloc[:3], right.iloc[3:]])

    match = {2, 3}
    semi = semi_anti_join(lds, rds, "k", "rk", "semi").to_pandas()
    anti = semi_anti_join(lds, rds, "k", "rk", "anti").to_pandas()

    exp_semi = sorted(v for k, v in zip(left["k"], left["v"])
                      if pd.notna(k) and int(k) in match)
    exp_anti = sorted(v for k, v in zip(left["k"], left["v"])
                      if pd.isna(k) or int(k) not in match)
    assert sorted(semi["v"].tolist()) == exp_semi
    assert sorted(anti["v"].tolist()) == exp_anti
    assert set(semi.columns) == set(anti.columns) == {"k", "v"}
    # partition: every left row lands in exactly one side
    assert len(semi) + len(anti) == len(left)


def test_semi_anti_join_rejects_bad_how(ray_session):
    from parquet_hs_ray.pipelines.relational import semi_anti_join

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    with pytest.raises(ValueError, match="semi"):
        semi_anti_join(ds, ds, "k", "k", "inner")


def test_semi_anti_join_all_null_and_empty_right_blocks(ray_session):
    """The two documented empty-block traps: a right block whose keys
    are ALL null (arrives as arrow `null` type) and a right side with
    zero non-null keys overall (key dtype unknowable -> join must be
    short-circuited, not attempted)."""
    from parquet_hs_ray.pipelines.relational import semi_anti_join

    left = pd.DataFrame({"k": ["a", "b", "c"], "v": [0, 1, 2]})
    right = pd.DataFrame({"rk": [None, None, "b"], "x": [0, 1, 2]})
    lds = ray.data.from_pandas(left)
    # first block all-null keys -> null-typed arrow block
    rds = ray.data.from_pandas([right.iloc[:2], right.iloc[2:]])
    semi = semi_anti_join(lds, rds, "k", "rk", "semi").to_pandas()
    anti = semi_anti_join(lds, rds, "k", "rk", "anti").to_pandas()
    assert sorted(semi["v"].tolist()) == [1]
    assert sorted(anti["v"].tolist()) == [0, 2]

    # zero non-null right keys: semi -> nothing, anti -> everything
    rds0 = ray.data.from_pandas(right.iloc[:2])
    assert semi_anti_join(lds, rds0, "k", "rk", "semi").count() == 0
    anti0 = semi_anti_join(lds, rds0, "k", "rk", "anti").to_pandas()
    assert sorted(anti0["v"].tolist()) == [0, 1, 2]


def test_semi_anti_join_degenerate_left_both_paths(ray_session):
    """Empty / all-NULL / extension-dtype left sides through BOTH the
    broadcast membership path (default) and the forced hash-join path
    (broadcast_keys_max=0) — the schema traps Ray's native join cannot
    survive on its own (null-typed key blocks, block-free left)."""
    from parquet_hs_ray.pipelines.relational import semi_anti_join

    cases = [([], [-1, 4, -4]), ([None] * 6, [None, 0, 0]),
             ([None], [None, 0]), ([1, None, 2, 2, 5], [2, 5, None, 9]),
             ([3, 3, 3], []), ([1, 2], [None, None])]
    for xs, ys in cases:
        left = pd.DataFrame({"k": pd.array(xs, dtype="Int64"),
                             "v": np.arange(len(xs), dtype=np.int64)})
        right = pd.DataFrame({"rk": pd.array(ys, dtype="Int64")})
        lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
        rset = {y for y in ys if y is not None}
        exp_semi = sorted(i for i, x in enumerate(xs)
                          if x is not None and x in rset)
        exp_anti = sorted(set(range(len(xs))) - set(exp_semi))
        for bmax in (1_000_000, 0):
            for how, exp in (("semi", exp_semi), ("anti", exp_anti)):
                out = semi_anti_join(lds, rds, "k", "rk", how,
                                     broadcast_keys_max=bmax).to_pandas()
                got = sorted(out["v"].tolist()) if "v" in out.columns else []
                assert got == exp, (xs, ys, bmax, how, got, exp)


_opt_keys = st.lists(st.one_of(st.none(),
                               st.integers(min_value=-4, max_value=4)),
                     min_size=0, max_size=25)


@settings(max_examples=8, deadline=None)
@given(_opt_keys, _opt_keys)
def test_semi_anti_join_property_matches_python_exists(ray_session, xs, ys):
    """Random multisets with NULLs: semi == rows whose non-null key is
    in the right key set, anti == the complement, multiplicities kept."""
    from parquet_hs_ray.pipelines.relational import semi_anti_join

    left = pd.DataFrame({"k": pd.array(xs, dtype="Int64"),
                         "v": np.arange(len(xs), dtype=np.int64)})
    right = pd.DataFrame({"rk": pd.array(ys, dtype="Int64")})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    rset = {y for y in ys if y is not None}
    exp_semi = sorted(i for i, x in enumerate(xs)
                      if x is not None and x in rset)
    for how, exp in (("semi", exp_semi),
                     ("anti", sorted(set(range(len(xs))) - set(exp_semi)))):
        out = semi_anti_join(lds, rds, "k", "rk", how).to_pandas()
        got = sorted(out["v"].tolist()) if "v" in out.columns else []
        assert got == exp, (how, got, exp)


def test_merge_into_semantics(ray_session):
    """MERGE INTO: update replaces, delete removes, insert adds; result
    matches a python dict-apply on a multi-block layout."""
    import ray.data

    from parquet_hs_ray.pipelines.relational import merge_into

    tgt = pd.DataFrame({"k": [1, 2, 3, 4, 5, 6],
                        "v": ["a", "b", "c", "d", "e", "f"]})
    chg = pd.DataFrame({
        "k":  [2,        4,        7,        5],
        "v":  ["B2",     "ignored", "G7",    "ignored"],
        "_op": ["upsert", "delete", "upsert", "delete"],
    })
    target = ray.data.from_pandas([tgt.iloc[:3], tgt.iloc[3:]])
    changes = ray.data.from_pandas([chg.iloc[:2], chg.iloc[2:]])
    out = (merge_into(target, changes, "k").to_pandas()
           .sort_values("k").reset_index(drop=True))

    state = {1: "a", 2: "b", 3: "c", 4: "d", 5: "e", 6: "f"}
    state[2] = "B2"; del state[4]; state[7] = "G7"; del state[5]
    exp = pd.DataFrame(sorted(state.items()), columns=["k", "v"])
    pd.testing.assert_frame_equal(out, exp)


def test_merge_into_latest_wins_and_bad_op(ray_session):
    """version_col reduces a change LOG to latest-wins (upsert beats
    delete on version ties); unknown ops raise."""
    import pytest
    import ray.data

    from parquet_hs_ray.pipelines.relational import merge_into

    tgt = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    log = pd.DataFrame({
        "k":   [1,        1,        2,        2,        3,        3],
        "v":   ["x1",     "x2",     "ignored", "late",  "n0",     "n1"],
        "_op": ["upsert", "upsert", "delete",  "upsert", "upsert", "upsert"],
        "seq": [10,       20,       5,         9,        1,        1],
    })
    out = (merge_into(tgt, ray.data.from_pandas([log.iloc[:3], log.iloc[3:]]),
                      "k", version_col="seq").to_pandas()
           .sort_values("k").reset_index(drop=True))
    # k=1: seq 20 wins ('x2'); k=2: seq 9 upsert wins over seq 5 delete;
    # k=3: version tie, both upserts — deterministic single survivor
    assert list(out["k"]) == [1, 2, 3]
    assert out.loc[0, "v"] == "x2"
    assert out.loc[1, "v"] == "late"
    assert out.loc[2, "v"] in ("n0", "n1")

    bad = ray.data.from_pandas(pd.DataFrame(
        {"k": [9], "v": ["z"], "_op": ["replace"]}))
    with pytest.raises(Exception, match="unknown _op"):
        merge_into(tgt, bad, "k").materialize()


def test_multikey_joins_match_pandas(ray_session):
    """Composite-key hash_join and broadcast_join vs pandas merge:
    differing right-side key names are renamed/dropped; arity mismatch
    and composite semi/anti raise."""
    import pytest
    import ray.data

    from parquet_hs_ray.pipelines.relational import broadcast_join, hash_join

    left = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "y", "x", "z", "x"],
                         "v": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"ka": [1, 2, 3, 1], "kb": ["x", "x", "x", "y"],
                          "w": [100, 200, 300, 400]})
    lds = ray.data.from_pandas([left.iloc[:2], left.iloc[2:]])
    rds = ray.data.from_pandas([right.iloc[:2], right.iloc[2:]])

    exp = (left.merge(right, left_on=["a", "b"], right_on=["ka", "kb"])
           .drop(columns=["ka", "kb"])
           .sort_values(["a", "b", "v"]).reset_index(drop=True))
    for joiner in (hash_join, broadcast_join):
        got = (joiner(lds, rds, ["a", "b"], ["ka", "kb"]).to_pandas()
               .sort_values(["a", "b", "v"]).reset_index(drop=True))
        got = got[exp.columns]
        pd.testing.assert_frame_equal(
            got.astype({"w": np.int64}), exp.astype({"w": np.int64}))

    with pytest.raises(ValueError, match="arity"):
        hash_join(lds, rds, ["a", "b"], ["ka"])
    with pytest.raises(ValueError, match="semi/anti"):
        broadcast_join(lds, rds, ["a", "b"], ["ka", "kb"], how="semi")
