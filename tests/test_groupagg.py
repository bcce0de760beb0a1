"""Unit tests for the high-cardinality grouped-aggregation helper.

Both merge strategies (driver-side small merge and the sorted-block path
with edge re-merge) must agree bit-exactly with a single-process pandas
groupby, including when hot keys straddle many sorted blocks.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from parquet_hs_ray.pipelines.groupagg import grouped_agg, grouped_sum


def _frame(n=5000, n_keys=700, seed=7):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n)
    k[: n // 4] = 3  # hot key: guaranteed to straddle blocks on the sort path
    return pd.DataFrame({
        "k": k,
        "v": rng.integers(-100, 100, n).astype(np.int64),
        "w": rng.normal(size=n).round(3),
    })


def _expected_sum(df):
    return df.groupby("k", as_index=False)[["v", "w"]].sum().sort_values("k").reset_index(drop=True)


@pytest.mark.parametrize("small_merge_rows", [500_000, 0])
def test_grouped_sum_matches_pandas(ray_session, small_merge_rows):
    df = _frame()
    ds = ray.data.from_pandas([df.iloc[i::16].reset_index(drop=True) for i in range(16)])
    out = (
        grouped_sum(ds, ["k"], ["v", "w"], small_merge_rows=small_merge_rows)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = _expected_sum(df)
    pd.testing.assert_frame_equal(out, exp, check_exact=False, atol=1e-9)


@pytest.mark.parametrize("small_merge_rows", [500_000, 0])
def test_grouped_agg_min_max_sum(ray_session, small_merge_rows):
    df = _frame(seed=11)
    ds = ray.data.from_pandas([df.iloc[i::8].reset_index(drop=True) for i in range(8)])
    out = (
        grouped_agg(ds, ["k"], {"v": "min", "w": "max"}, small_merge_rows=small_merge_rows)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = (df.groupby("k", as_index=False).agg({"v": "min", "w": "max"})
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_grouped_sum_empty(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                            "v": pd.Series([], dtype=np.int64)}))
    out = grouped_sum(ds, ["k"], ["v"]).to_pandas()
    assert len(out) == 0


def test_grouped_sum_multikey_string(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "zz"], 2000),
        "b": rng.integers(0, 50, 2000),
        "v": rng.integers(0, 10, 2000).astype(np.int64),
    })
    ds = ray.data.from_pandas([df.iloc[:1000].reset_index(drop=True),
                               df.iloc[1000:].reset_index(drop=True)])
    out = (grouped_sum(ds, ["a", "b"], ["v"], small_merge_rows=0)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    exp = (df.groupby(["a", "b"], as_index=False)["v"].sum()
           .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def _docs_frame(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "src": np.array(["cc", "wiki", "book", "code"])[rng.integers(0, 4, n)],
        "lang": np.array(["en", "de", "fr"])[rng.integers(0, 3, n)],
        "chars": rng.integers(1, 500, n).astype(np.int64),
        "n": np.ones(n, dtype=np.int64),
    })


@pytest.mark.parametrize("small_merge_rows", [500_000, 0])
def test_rollup_sum_matches_sql_semantics(ray_session, small_merge_rows):
    from parquet_hs_ray.pipelines.groupagg import rollup_sum

    df = _docs_frame()
    ds = ray.data.from_pandas([df.iloc[i::8].reset_index(drop=True) for i in range(8)])
    parts = ds.map_batches(
        lambda b: b.groupby(["src", "lang"], sort=False).sum().reset_index(),
        batch_format="pandas")
    out = rollup_sum(parts, ["src", "lang"], ["chars", "n"],
                     small_merge_rows=small_merge_rows).to_pandas()

    fine = df.groupby(["src", "lang"], as_index=False)[["chars", "n"]].sum()
    mid = df.groupby(["src"], as_index=False)[["chars", "n"]].sum()
    # level row counts and grouping ids
    assert sorted(out["grouping_id"].unique()) == [0, 1, 3]
    assert len(out[out.grouping_id == 0]) == len(fine)
    assert len(out[out.grouping_id == 1]) == len(mid)
    assert len(out[out.grouping_id == 3]) == 1
    # rolled keys are NULL
    lvl1 = out[out.grouping_id == 1]
    assert lvl1["lang"].isna().all() and lvl1["src"].notna().all()
    tot = out[out.grouping_id == 3]
    assert tot["src"].isna().all() and tot["lang"].isna().all()
    # values agree with pandas at every level
    got_fine = (out[out.grouping_id == 0][["src", "lang", "chars", "n"]]
                .sort_values(["src", "lang"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got_fine, fine.sort_values(["src", "lang"]).reset_index(drop=True))
    got_mid = (lvl1[["src", "chars", "n"]]
               .sort_values("src").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got_mid, mid.sort_values("src").reset_index(drop=True))
    assert int(tot["chars"].iloc[0]) == int(df["chars"].sum())
    assert int(tot["n"].iloc[0]) == len(df)


def test_cube_sum_all_subsets(ray_session):
    from parquet_hs_ray.pipelines.groupagg import cube_sum

    df = _docs_frame(n=1500, seed=9)
    ds = ray.data.from_pandas([df.iloc[i::4].reset_index(drop=True) for i in range(4)])
    parts = ds.map_batches(
        lambda b: b.groupby(["src", "lang"], sort=False).sum().reset_index(),
        batch_format="pandas")
    out = cube_sum(parts, ["src", "lang"], ["chars", "n"]).to_pandas()
    assert sorted(out["grouping_id"].unique()) == [0, 1, 2, 3]
    # lang-only level (src rolled up -> MSB set -> gid 2)
    lvl2 = out[out.grouping_id == 2]
    exp = df.groupby("lang", as_index=False)[["chars", "n"]].sum()
    got = (lvl2[["lang", "chars", "n"]].sort_values("lang")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exp.sort_values("lang").reset_index(drop=True))
    assert lvl2["src"].isna().all()
    # every level conserves the total
    for gid in (0, 1, 2, 3):
        assert int(out[out.grouping_id == gid]["n"].sum()) == len(df)
