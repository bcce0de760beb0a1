"""pagerank (pipelines/graph.py): integer-exact simplified PageRank —
brute-force twin parity, multi-edge collapse, dangling-mass leak,
determinism across blockings."""

import numpy as np
import pandas as pd
import pytest


def _brute(edges: pd.DataFrame, iters=5, scale=10**12, damp=85):
    e = edges.drop_duplicates()
    deg = e.groupby("src").size()
    nodes = sorted(set(e["src"]) | set(e["dst"]))
    r = {n: scale for n in nodes}
    base = (scale * (100 - damp)) // 100
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in e.itertuples(index=False):
            inflow[d] += (r[s] * damp) // (100 * int(deg[s]))
        r = {n: base + inflow[n] for n in nodes}
    return pd.DataFrame({"node": nodes, "rank_u": [r[n] for n in nodes]})


@pytest.fixture(scope="module")
def edge_df():
    rng = np.random.default_rng(5)
    n = 3000
    return pd.DataFrame({"src": rng.integers(0, 60, n),
                         "dst": rng.integers(100, 220, n)})


def test_pagerank_matches_bruteforce(ray_session, edge_df):
    import ray.data

    from parquet_hs_ray.pipelines.graph import pagerank

    ds = ray.data.from_pandas([edge_df.iloc[i::5].reset_index(drop=True)
                               for i in range(5)])
    got = (pagerank(ds).to_pandas().sort_values("node")
           .reset_index(drop=True))
    want = _brute(edge_df)
    got["node"] = got["node"].astype(np.int64)
    assert got["node"].tolist() == want["node"].tolist()
    assert got["rank_u"].tolist() == want["rank_u"].tolist()


def test_pagerank_blocking_independent(ray_session, edge_df):
    import ray.data

    from parquet_hs_ray.pipelines.graph import pagerank

    a = (pagerank(ray.data.from_pandas(edge_df)).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (pagerank(ray.data.from_pandas(
        [edge_df.iloc[:7], edge_df.iloc[7:].reset_index(drop=True)]))
        .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_simple_chain(ray_session):
    """a->b->c: hand-checkable — mass flows down the chain, c dangles."""
    import ray.data

    from parquet_hs_ray.pipelines.graph import pagerank

    e = pd.DataFrame({"src": ["a", "b", "a"], "dst": ["b", "c", "b"]})
    out = (pagerank(ray.data.from_pandas(e), iters=1, scale=100, damp_pct=85)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # r0=100 each; base=15; a gets nothing; b gets (100*85)//100=85;
    # c gets 85 from b (multi-edge a->b collapsed, outdeg(a)=1)
    assert dict(zip(out["node"], out["rank_u"])) == {
        "a": 15, "b": 100, "c": 100}
