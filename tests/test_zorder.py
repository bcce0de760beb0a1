"""Z-order layout tests: Morton kernel properties, the Ray sort
pipeline, and the point of it all — per-block min/max boxes tight in
BOTH dimensions (better two-predicate pruning than any single sort)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from parquet_hs_ray.functions import zorder as zo


def test_spread16_golden():
    # 0b1111111111111111 -> alternating 01 pattern over 32 bits
    assert int(zo._spread16(np.array([0xFFFF], dtype=np.uint16))[0]) == 0x55555555
    assert int(zo._spread16(np.array([0], dtype=np.uint16))[0]) == 0
    assert int(zo._spread16(np.array([0b101], dtype=np.uint16))[0]) == 0b10001


def test_morton2_interleave_exact():
    rng = np.random.default_rng(4)
    u = rng.integers(0, 65536, 500).astype(np.uint16)
    v = rng.integers(0, 65536, 500).astype(np.uint16)
    z = zo.morton2(u, v)
    # bit-by-bit reference
    for i in (0, 17, 499):
        expected = 0
        for b in range(16):
            expected |= ((int(u[i]) >> b) & 1) << (2 * b)
            expected |= ((int(v[i]) >> b) & 1) << (2 * b + 1)
        assert int(z[i]) == expected


def test_scale_to_u16_bounds_and_degenerate():
    x = np.array([10, 55, 100], dtype=np.int64)
    s = zo.scale_to_u16(x, 10, 100)
    assert s[0] == 0 and s[2] == 65535 and 0 < s[1] < 65535
    # out-of-range values clip, degenerate range maps to zero
    assert zo.scale_to_u16(np.array([5, 200]), 10, 100).tolist() == [0, 65535]
    assert zo.scale_to_u16(np.array([7, 7]), 7, 7).tolist() == [0, 0]


def test_morton_key_locality():
    # points close in BOTH dims get closer keys than points far in one dim
    z = zo.morton_key2(np.array([100, 101, 100]), 0, 65535,
                       np.array([200, 201, 40000]), 0, 65535)
    assert abs(int(z[1]) - int(z[0])) < abs(int(z[2]) - int(z[0]))


def _boxes(df, n_blocks):
    """Cut df (in current order) into n equal blocks; per-block min/max
    boxes over (x, y)."""
    out = []
    for part in np.array_split(np.arange(len(df)), n_blocks):
        b = df.iloc[part]
        out.append((b["x"].min(), b["x"].max(), b["y"].min(), b["y"].max()))
    return out


def _hits(boxes, x0, x1, y0, y1):
    return sum(1 for (xl, xh, yl, yh) in boxes
               if xh >= x0 and xl <= x1 and yh >= y0 and yl <= y1)


def test_zorder_prunes_two_predicates_better_than_single_sort(ray_session):
    from parquet_hs_ray.pipelines.layout import zorder_sort

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame({"x": rng.integers(0, 10_000, n),
                       "y": rng.integers(0, 10_000, n),
                       "payload": rng.integers(0, 100, n)})
    ds = ray.data.from_pandas([df.iloc[i::8].reset_index(drop=True)
                               for i in range(8)])
    zdf = zorder_sort(ds, "x", "y").to_pandas()
    assert len(zdf) == n and sorted(zdf.columns) == ["payload", "x", "y"]
    # both orderings chopped into the same number of blocks
    n_blocks = 32
    z_boxes = _boxes(zdf, n_blocks)
    x_boxes = _boxes(df.sort_values("x").reset_index(drop=True), n_blocks)
    # a query box selective in BOTH dims: z-order touches far fewer blocks
    probes = [(1000, 2000, 1000, 2000), (7000, 8000, 2000, 3000),
              (4000, 5000, 8000, 9000)]
    z_total = sum(_hits(z_boxes, *p) for p in probes)
    x_total = sum(_hits(x_boxes, *p) for p in probes)
    assert z_total < x_total, (z_total, x_total)
    # and a y-only predicate (the single sort's blind spot) prunes at all
    z_y = _hits(z_boxes, 0, 10_000, 1000, 1500)
    x_y = _hits(x_boxes, 0, 10_000, 1000, 1500)
    assert z_y < x_y == n_blocks


def test_zorder_sort_keeps_key_when_asked(ray_session):
    from parquet_hs_ray.pipelines.layout import zorder_sort

    df = pd.DataFrame({"x": [3, 1, 2], "y": [9, 9, 9]})
    out = zorder_sort(ray.data.from_pandas(df), "x", "y",
                      keep_key=True).to_pandas()
    assert "_zkey" in out.columns
    assert out["_zkey"].is_monotonic_increasing


def test_morton2_sql_matches_kernel():
    import duckdb

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"a": rng.integers(0, 5000, 400),
                       "b": rng.integers(100, 900, 400)})
    expr = zo.morton2_sql("a", int(df.a.min()), int(df.a.max()),
                          "b", int(df.b.min()), int(df.b.max()))
    got = duckdb.query(f"SELECT {expr} AS z FROM df").df()["z"].to_numpy()
    exp = zo.morton_key2(df["a"].to_numpy(), df.a.min(), df.a.max(),
                         df["b"].to_numpy(), df.b.min(), df.b.max())
    np.testing.assert_array_equal(got.astype(np.int64), exp)


def test_zorder_layout_improves_manifest_pruning(ray_session, tmp_path):
    """End-to-end: z-order the table, encode it, and the per-partition
    manifest min/max stats prune MORE partitions under a two-column
    predicate than the same data encoded in natural (row) order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_hs_ray.pipelines.encode_job import (encode_dataset,
                                                     pruned_partition_ids)
    from parquet_hs_ray.pipelines.layout import zorder_sort

    rng = np.random.default_rng(23)
    n = 24_000
    df = pd.DataFrame({"x": rng.integers(0, 10_000, n).astype(np.int64),
                       "y": rng.integers(0, 10_000, n).astype(np.int64),
                       "n_tok": np.full(n, 10, dtype=np.int32)})
    ds = ray.data.from_pandas([df.iloc[i::8].reset_index(drop=True)
                               for i in range(8)])
    zdf = zorder_sort(ds, "x", "y").to_pandas()

    results = {}
    for name, frame in (("natural", df), ("zorder", zdf)):
        src = tmp_path / f"{name}.parquet"
        pq.write_table(pa.Table.from_pandas(frame, preserve_index=False),
                       src, row_group_size=1000)
        out = tmp_path / f"enc_{name}"
        encode_dataset(str(src), str(out), token_budget=10_000)  # ~24 parts
        pred = [("x", "between", (1000, 2000)), ("y", "between", (1000, 2000))]
        kept, total = pruned_partition_ids(str(out), pred)
        results[name] = (len(kept), total)

    (z_kept, z_total), (n_kept, n_total) = results["zorder"], results["natural"]
    assert z_total == n_total and z_total >= 16
    # natural order can't prune a uniform table at all; z-order must
    # prune the vast majority of partitions for a ~1% query box
    assert n_kept == n_total
    assert z_kept < z_total // 2, results


def test_cli_layout_zorder_roundtrip(ray_session, tmp_path, capsys):
    """`cli layout --zorder x,y` rewrites parquet in Morton order and,
    run in-process against an existing Ray session, leaves that session
    alive (owns-session guard)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from parquet_hs_ray.cli import main

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"x": rng.integers(0, 1000, 3000).astype(np.int64),
                       "y": rng.integers(0, 1000, 3000).astype(np.int64)})
    src = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    out = tmp_path / "zout"
    assert main(["layout", "--input", str(src), "--out", str(out),
                 "--zorder", "x,y"]) == 0
    assert ray.is_initialized()  # the CLI must not tear down our session
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == len(df) and res["zorder"] == ["x", "y"]
    back = pq.read_table(out).to_pandas()
    assert len(back) == len(df)
    # same multiset of rows, z-sorted order
    a = df.sort_values(["x", "y"]).reset_index(drop=True)
    b = back.sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    zo_keys = zo.morton_key2(back["x"].to_numpy(), df.x.min(), df.x.max(),
                             back["y"].to_numpy(), df.y.min(), df.y.max())
    assert np.all(np.diff(zo_keys) >= 0)


def test_morton3_interleave_exact_and_sql_parity():
    import duckdb

    rng = np.random.default_rng(7)
    u = rng.integers(0, 65536, 300).astype(np.uint16)
    v = rng.integers(0, 65536, 300).astype(np.uint16)
    w = rng.integers(0, 65536, 300).astype(np.uint16)
    z = zo.morton3(u, v, w)
    for i in (0, 99, 299):
        expected = 0
        for b in range(16):
            expected |= ((int(u[i]) >> b) & 1) << (3 * b)
            expected |= ((int(v[i]) >> b) & 1) << (3 * b + 1)
            expected |= ((int(w[i]) >> b) & 1) << (3 * b + 2)
        assert int(z[i]) == expected
    # SQL twin parity on raw int columns
    df = pd.DataFrame({"a": rng.integers(0, 9000, 300),
                       "b": rng.integers(50, 600, 300),
                       "c": rng.integers(-40, 40, 300)})
    expr = zo.morton3_sql("a", int(df.a.min()), int(df.a.max()),
                          "b", int(df.b.min()), int(df.b.max()),
                          "c", int(df.c.min()), int(df.c.max()))
    got = duckdb.query(f"SELECT {expr} AS z FROM df").df()["z"].to_numpy()
    exp = zo.morton_key3(df.a.to_numpy(), df.a.min(), df.a.max(),
                         df.b.to_numpy(), df.b.min(), df.b.max(),
                         df.c.to_numpy(), df.c.min(), df.c.max())
    np.testing.assert_array_equal(got.astype(np.int64), exp)


def test_scale_to_u16_wide_range_and_negative_float():
    # range wider than 2^47 (nanosecond timestamps): pre-shift keeps the
    # scale monotone and in-bounds instead of wrapping int64
    lo, hi = 0, 3 * 24 * 3600 * 10**9  # ~2.6e14
    xs = np.array([lo, hi // 2, hi - 1000, hi], dtype=np.int64)
    s = zo.scale_to_u16(xs, lo, hi)
    assert s[0] == 0 and s[-1] == 65535
    assert np.all(np.diff(s.astype(int)) >= 0) and s[2] >= 65534
    # full-range int64 column: hi-lo overflows int64, uint64 diff doesn't
    s2 = zo.scale_to_u16(np.array([-(2**62), 0, 2**62]), -(2**62), 2**62)
    assert s2[0] == 0 and s2[-1] == 65535 and 0 < s2[1] < 65535
    # negative float floors (not truncates): -2.5 -> -3, matching SQL floor
    s3 = zo.scale_to_u16(np.array([-2.5, 0.0]), -3, 0)
    assert s3[0] == zo.scale_to_u16(np.array([-3, 0]), -3, 0)[0]


def test_morton2_sql_matches_kernel_on_floats():
    import duckdb

    rng = np.random.default_rng(15)
    df = pd.DataFrame({"a": np.round(rng.uniform(-50, 50, 300), 3),
                       "b": rng.integers(0, 100, 300)})
    alo, ahi = int(np.floor(df.a.min())), int(np.floor(df.a.max()))
    expr = zo.morton2_sql("a", alo, ahi, "b", int(df.b.min()), int(df.b.max()))
    got = duckdb.query(f"SELECT {expr} AS z FROM df").df()["z"].to_numpy()
    exp = zo.morton_key2(df.a.to_numpy(), alo, ahi,
                         df.b.to_numpy(), df.b.min(), df.b.max())
    np.testing.assert_array_equal(got.astype(np.int64), exp)


def test_zorder_sort_empty_and_collision(ray_session):
    from parquet_hs_ray.pipelines.layout import zorder_sort

    empty = ray.data.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=np.int64),
                                               "y": pd.Series([], dtype=np.int64)}))
    assert zorder_sort(empty, "x", "y").count() == 0
    bad = ray.data.from_pandas(pd.DataFrame({"x": [1], "y": [2], "_zkey": [9]}))
    with pytest.raises(ValueError, match="_zkey"):
        zorder_sort(bad, "x", "y")


# --- property tests ---------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_i64 = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=60, deadline=None)
@given(st.lists(_i64, min_size=2, max_size=50), _i64, _i64)
def test_scale_to_u16_properties(xs, a, b):
    lo, hi = min(a, b), max(a, b)
    s = zo.scale_to_u16(np.array(xs, dtype=np.int64), lo, hi)
    # bounds
    assert s.dtype == np.uint16
    assert int(s.max(initial=0)) <= 65535
    # monotone in x (after clipping)
    xc = np.clip(np.array(xs, dtype=np.int64), lo, hi)
    order = np.argsort(xc, kind="stable")
    assert np.all(np.diff(s[order].astype(np.int64)) >= 0)
    # endpoints map to the extremes
    if hi > lo:
        ends = zo.scale_to_u16(np.array([lo, hi]), lo, hi)
        assert ends[0] == 0 and ends[1] == 65535


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 65535), min_size=1, max_size=40),
       st.lists(st.integers(0, 65535), min_size=1, max_size=40))
def test_morton2_bijective_on_ranks(us, vs):
    n = min(len(us), len(vs))
    u = np.array(us[:n], dtype=np.uint16)
    v = np.array(vs[:n], dtype=np.uint16)
    z = zo.morton2(u, v)
    # de-interleave inverts exactly: even bits -> u, odd bits -> v
    def gather(zv, off):
        out = 0
        for b in range(16):
            out |= ((int(zv) >> (2 * b + off)) & 1) << b
        return out
    for i in range(n):
        assert gather(z[i], 0) == int(u[i])
        assert gather(z[i], 1) == int(v[i])
