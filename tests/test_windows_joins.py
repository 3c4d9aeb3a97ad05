"""Unit tests for the keyed time-series operators (rayxt.windows,
rayxt.joins) against brute-force in-process references."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n=300, users=7, seed=13):
    rng = np.random.default_rng(seed)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        rows.append({
            "event_id": i,
            "user_id": int(rng.integers(users)),
            "ts": base + datetime.timedelta(
                seconds=int(rng.integers(0, 6 * 86400))),
            "kind": ["a", "b"][int(rng.integers(2))],
            "value": float(rng.random()),
        })
    # force duplicate-timestamp edge cases
    rows[10]["ts"] = rows[11]["ts"] = rows[12]["ts"]
    rows[10]["user_id"] = rows[11]["user_id"] = rows[12]["user_id"] = 3
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def ev_df():
    return _events()


def test_asof_join_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.joins import asof_join

    left_df = ev_df[ev_df["kind"] == "a"]
    right_df = ev_df[ev_df["kind"] == "b"]
    left = rd.from_arrow(pa.Table.from_pandas(
        left_df[["event_id", "user_id", "ts"]], preserve_index=False))
    right = rd.from_arrow(pa.Table.from_pandas(
        right_df[["event_id", "user_id", "ts"]], preserve_index=False))
    got = asof_join(left, right, key="user_id", on="ts",
                    left_cols=["event_id", "user_id", "ts"],
                    right_cols=["event_id"], right_suffix="_b").to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)

    want_rows = []
    for _, lrow in left_df.iterrows():
        cand = right_df[(right_df["user_id"] == lrow["user_id"])
                        & (right_df["ts"] <= lrow["ts"])]
        if cand.empty:
            continue
        best = cand.sort_values(["ts", "event_id"]).iloc[-1]
        want_rows.append({"event_id": lrow["event_id"],
                          "user_id": lrow["user_id"], "ts": lrow["ts"],
                          "event_id_b": best["event_id"]})
    want = pd.DataFrame(want_rows).sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["event_id_b"].tolist() == want["event_id_b"].tolist()
    assert got.dtypes["event_id_b"] == "int64"


def test_sessionize_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import sessionize

    gap = 3600.0
    ds = rd.from_arrow(pa.Table.from_pandas(
        ev_df[["user_id", "ts"]], preserve_index=False))
    got = sessionize(ds, key="user_id", ts_col="ts", gap_s=gap).to_pandas()
    got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)

    want_rows = []
    for uid, g in ev_df.groupby("user_id"):
        ts = sorted(g["ts"])
        start, prev, count = ts[0], ts[0], 1
        for t in ts[1:]:
            if (t - prev).total_seconds() > gap:
                want_rows.append((uid, start, count,
                                  int((prev - start).total_seconds() * 1e6)))
                start, count = t, 1
            else:
                count += 1
            prev = t
        want_rows.append((uid, start, count,
                          int((prev - start).total_seconds() * 1e6)))
    want = pd.DataFrame(want_rows, columns=["user_id", "session_start",
                                            "n_events", "duration_us"])
    want = want.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert got["n_events"].sum() == len(ev_df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_topk_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import grouped_topk

    ds = rd.from_arrow(pa.Table.from_pandas(
        ev_df[["user_id", "event_id", "value"]], preserve_index=False))
    got = grouped_topk(ds, key="user_id", order_col="value", k=3,
                       tie_cols=("event_id",)).to_pandas()
    got = got.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    want = (ev_df.sort_values(["value", "event_id"],
                              ascending=[False, True], kind="mergesort")
            .groupby("user_id", sort=False).head(3)
            [["user_id", "event_id", "value"]]
            .sort_values(["user_id", "value", "event_id"],
                         ascending=[True, False, True]).reset_index(drop=True))
    assert got[["user_id", "event_id"]].to_numpy().tolist() == \
        want[["user_id", "event_id"]].to_numpy().tolist()


def test_embedding_centroids_match_numpy(ray_session):
    import ray.data as rd

    from rayxt.ann import embedding_centroids

    rng = np.random.default_rng(21)
    labels = rng.integers(0, 4, size=200)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    }))
    got = embedding_centroids(ds).to_pandas()
    assert len(got) == 4 * 8
    for lab in range(4):
        want = vecs[labels == lab].astype(np.float64).mean(axis=0)
        sub = got[got["label"] == lab].sort_values("dim")
        assert np.allclose(sub["centroid"].to_numpy(),
                           np.round(want, 6), atol=1e-6)


def test_group_quantiles_matches_numpy(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import group_quantiles

    ds = rd.from_arrow(pa.Table.from_pandas(
        ev_df[["kind", "value"]], preserve_index=False))
    got = group_quantiles(ds, key="kind", value_col="value",
                          qs=(0.5, 0.95)).to_pandas()
    got = got.sort_values("kind").reset_index(drop=True)
    for _, row in got.iterrows():
        vals = ev_df[ev_df["kind"] == row["kind"]]["value"].to_numpy()
        assert row["p50"] == round(float(np.percentile(vals, 50)), 6)
        assert row["p95"] == round(float(np.percentile(vals, 95)), 6)


def test_asof_join_preserves_narrow_dtypes(ray_session):
    """int32/float32 inputs must come out int32/float32, not widened."""
    import ray.data as rd

    from rayxt.joins import asof_join

    left = rd.from_arrow(pa.table({
        "eid": pa.array([1, 2], pa.int32()),
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 20], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "eid": pa.array([7], pa.int32()),
        "val": pa.array([1.5], pa.float32()),
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([5], pa.int64()),
    }))
    got = asof_join(left, right, key="k", on="ts",
                    left_cols=["eid", "k", "ts"],
                    right_cols=["eid", "val"], right_suffix="_r").to_pandas()
    val_col = "val_r" if "val_r" in got.columns else "val"
    assert str(got.dtypes["eid"]) == "int32"
    assert str(got.dtypes["eid_r"]) == "int32"
    assert str(got.dtypes[val_col]) == "float32"
    assert got["eid_r"].tolist() == [7, 7]


def test_asof_join_bucketed_matches_unsalted(ray_session, ev_df):
    """Opt-in hot-key mode must produce exactly the unsalted result."""
    import ray.data as rd

    from rayxt.joins import asof_join

    left_df = ev_df[ev_df["kind"] == "a"]
    right_df = ev_df[ev_df["kind"] == "b"]
    left = rd.from_arrow(pa.Table.from_pandas(
        left_df[["event_id", "user_id", "ts"]], preserve_index=False))
    right = rd.from_arrow(pa.Table.from_pandas(
        right_df[["event_id", "user_id", "ts"]], preserve_index=False))
    kw = dict(key="user_id", on="ts",
              left_cols=["event_id", "user_id", "ts"],
              right_cols=["event_id"], right_suffix="_b")
    plain = (asof_join(left, right, **kw).to_pandas()
             .sort_values("event_id").reset_index(drop=True))
    # ~1h buckets over the synthetic day: plenty of carry traffic
    salted = (asof_join(left, right, bucket_width=3_600_000_000, **kw)
              .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted)


def test_sessionize_bucketed_matches_unsalted_on_hot_key(ray_session):
    """A single 10^6-row key is processed in time buckets and merged;
    result equals the single-pass kernel run on the same data."""
    import ray.data as rd

    from rayxt.windows import sessionize

    rng = np.random.default_rng(5)
    n = 1_000_000
    # bursty stream: mostly small gaps, occasional > gap_s breaks;
    # a few exact-boundary gaps too
    gaps = rng.choice([1.0, 10.0, 120.0, 1800.0, 1801.0, 4000.0], size=n,
                      p=[0.55, 0.3, 0.1, 0.02, 0.02, 0.01])
    ts = pd.to_datetime((gaps.cumsum() * 1e6).astype("int64"), unit="us")
    df = pd.DataFrame({"user_id": np.int64(7), "ts": ts})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    ds = ds.repartition(16)

    got = (sessionize(ds, key="user_id", ts_col="ts", gap_s=1800.0,
                      bucket_s=86_400.0)
           .to_pandas().sort_values("session_start").reset_index(drop=True))

    # single-pass reference on the driver (exact kernel, same rule)
    t = df["ts"]
    brk = t.diff().dt.total_seconds() > 1800.0
    sid = brk.cumsum()
    grouped = df.groupby(sid)["ts"]
    want = pd.DataFrame({
        "session_start": grouped.min().reset_index(drop=True),
        "n_events": grouped.size().reset_index(drop=True).astype("int64"),
        "duration_us": ((grouped.max() - grouped.min())
                        .reset_index(drop=True)
                        .to_numpy().astype("timedelta64[us]").astype("int64")),
    }).sort_values("session_start").reset_index(drop=True)
    assert len(got) == len(want)
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["duration_us"].tolist() == want["duration_us"].tolist()
    assert (got["session_start"].to_numpy()
            == want["session_start"].to_numpy()).all()


def test_range_join_count_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.joins import range_join_count

    left = ev_df[ev_df["kind"] == "a"][["event_id", "user_id", "ts"]]
    right = ev_df[ev_df["kind"] == "b"][["user_id", "ts"]]
    before_us = 6 * 3600 * 1_000_000  # 6h window, inclusive both ends
    after_us = 3600 * 1_000_000
    got = range_join_count(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        key="user_id", on="ts", before=before_us, after=after_us,
        left_cols=["event_id", "user_id", "ts"], out_col="n",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    want = []
    for row in left.sort_values("event_id").itertuples():
        lo = row.ts - datetime.timedelta(microseconds=before_us)
        hi = row.ts + datetime.timedelta(microseconds=after_us)
        n = ((right["user_id"] == row.user_id)
             & (right["ts"] >= lo) & (right["ts"] <= hi)).sum()
        want.append(int(n))
    assert got["n"].tolist() == want
    assert (got["event_id"].to_numpy()
            == left.sort_values("event_id")["event_id"].to_numpy()).all()
    assert got["event_id"].dtype == np.int64  # no null-upcast widening
    assert sum(want) > 0


def test_hopping_windows_match_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import assign_hopping_windows

    size_us, hop_us = 7_200_000_000, 1_800_000_000  # 2h every 30min
    got = assign_hopping_windows(
        rd.from_pandas(ev_df).repartition(4), ts_col="ts",
        size_us=size_us, hop_us=hop_us, cols=["event_id"],
    ).to_pandas().sort_values(["event_id", "win"]).reset_index(drop=True)

    # every event appears in exactly size/hop windows
    assert (got.groupby("event_id").size() == size_us // hop_us).all()
    assert len(got) == len(ev_df) * (size_us // hop_us)

    # each assigned window actually covers the event, and the windows
    # flanking the assigned range do not
    ts_us = (ev_df.set_index("event_id")["ts"].to_numpy()
             .astype("datetime64[us]").astype("int64"))
    ev_ts = dict(zip(ev_df["event_id"], ts_us))
    for eid, win in zip(got["event_id"], got["win"]):
        start = win * hop_us
        assert start <= ev_ts[eid] < start + size_us
    lo = got.groupby("event_id")["win"].min()
    hi = got.groupby("event_id")["win"].max()
    for eid in ev_df["event_id"]:
        assert not (lo[eid] - 1) * hop_us <= ev_ts[eid] < (lo[eid] - 1) * hop_us + size_us
        assert not (hi[eid] + 1) * hop_us <= ev_ts[eid] < (hi[eid] + 1) * hop_us + size_us


def test_sequence_stats_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import sequence_stats

    got = sequence_stats(
        rd.from_pandas(ev_df[["event_id", "user_id", "ts"]]).repartition(4),
        key="user_id", ts_col="ts", tie_col="event_id",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    want = ev_df.sort_values(["ts", "event_id"]).copy()
    want["pos"] = want.groupby("user_id").cumcount() + 1
    us = want["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    want["us"] = us
    want["gap_us"] = want.groupby("user_id")["us"].diff()
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["pos"].tolist() == want["pos"].tolist()
    g = got["gap_us"].astype("float64")
    w = want["gap_us"]
    assert ((g.isna() == w.isna()).all()
            and (g.dropna().to_numpy() == w.dropna().to_numpy()).all())

    # sentinel mode: plain int64, no nulls (cross-engine-hash-safe path)
    got2 = sequence_stats(
        rd.from_pandas(ev_df[["event_id", "user_id", "ts"]]).repartition(4),
        key="user_id", ts_col="ts", tie_col="event_id", first_gap=-1,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert str(got2["gap_us"].dtype) == "int64"
    assert (got2["gap_us"].to_numpy()
            == w.fillna(-1).to_numpy().astype("int64")).all()


def test_pivot_count_matches_crosstab(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import pivot_count

    got = pivot_count(
        rd.from_pandas(ev_df[["user_id", "kind"]]).repartition(5),
        key="user_id", cat_col="kind", categories=("a", "b"),
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    want = (pd.crosstab(ev_df["user_id"], ev_df["kind"])
            .reindex(columns=["a", "b"], fill_value=0))
    assert got["n_a"].tolist() == want["a"].tolist()
    assert got["n_b"].tolist() == want["b"].tolist()


def test_global_rank_ntile_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import global_rank

    # value column with heavy duplication (the histogram assumption)
    df = ev_df[["event_id", "user_id"]].copy()
    got = global_rank(
        rd.from_pandas(df).repartition(5), order_col="user_id",
        tie_col="event_id", ntile=7,
    ).to_pandas().sort_values("rank").reset_index(drop=True)

    want = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    want["rank"] = np.arange(1, len(want) + 1)
    n, k = len(want), 7
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r)
    buckets = np.repeat(np.arange(1, k + 1), sizes)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["bucket"].tolist() == buckets.tolist()


def test_rolling_stats_matches_pandas(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import rolling_stats

    out = rolling_stats(
        rd.from_pandas(ev_df).repartition(5), key="user_id", ts_col="ts",
        tie_col="event_id", value_col="value", window=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    want = ev_df.sort_values(["user_id", "ts", "event_id"]).copy()
    r = want.groupby("user_id")["value"].rolling(4, min_periods=1)
    want["roll_sum"] = np.round(r.sum().reset_index(0, drop=True), 6)
    want["roll_avg"] = np.round(r.mean().reset_index(0, drop=True), 6)
    want["roll_max"] = r.max().reset_index(0, drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    for col in ("roll_sum", "roll_avg", "roll_max"):
        assert np.allclose(out[col], want[col]), col


def test_ordered_string_agg_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import ordered_string_agg

    out = ordered_string_agg(
        rd.from_pandas(ev_df).repartition(5), key="user_id", ts_col="ts",
        tie_col="event_id", cat_col="kind",
    ).to_pandas().set_index("user_id").sort_index()

    for uid, g in ev_df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        assert out.loc[uid, "path"] == ",".join(g["kind"])
        assert int(out.loc[uid, "n_events"]) == len(g)


def test_dense_grid_matches_bruteforce(ray_session, ev_df):
    import ray.data as rd

    from rayxt.windows import dense_grid

    df = ev_df.copy()
    df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
    out = dense_grid(rd.from_pandas(df).repartition(5),
                     dim_a="day", dim_b="kind")
    out = out.sort_values(["day", "kind"]).reset_index(drop=True)

    days = sorted(df["day"].unique())
    kinds = sorted(df["kind"].unique())
    assert len(out) == len(days) * len(kinds)
    counts = df.groupby(["day", "kind"]).size()
    for _, row in out.iterrows():
        assert row["n"] == counts.get((row["day"], row["kind"]), 0)


def test_global_rank_cardinality_guard(ray_session):
    """A high-cardinality order column must fail loudly instead of
    materializing one histogram row per distinct value on the driver
    (VERDICT r3 item 5)."""
    import ray.data as rd

    from rayxt.windows import global_rank

    df = pd.DataFrame({"event_id": np.arange(500),
                       "v": np.arange(500) * 0.5})
    with pytest.raises(ValueError, match="distinct"):
        global_rank(rd.from_pandas(df), order_col="v",
                    tie_col="event_id", max_histogram=100)
    # under the bound the rank is unchanged
    out = (global_rank(rd.from_pandas(df), order_col="v",
                       tie_col="event_id", max_histogram=1000)
           .to_pandas().sort_values("rank"))
    assert out["event_id"].tolist() == list(range(500))


def _hot_events(n: int, n_keys: int, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.sort(
        rng.integers(0, 30 * 86_400_000_000, size=n)).astype(
        "timedelta64[us]")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_keys, size=n).astype(np.int64),
        "ts": pd.Series(ts),
        "value": np.round(rng.integers(0, 50, size=n) / 2.0, 6),
    })


def test_sequence_stats_bucketed_parity_hot_key(ray_session):
    """bucket_s mode == single-pass mode on a corpus dominated by one
    hot key (VERDICT r3 item 3): pos and gap_us identical."""
    import ray.data as rd

    from rayxt.windows import sequence_stats

    df = _hot_events(30_000, 3)  # 3 keys => ~10k rows per key
    ds = rd.from_pandas(df).repartition(8)
    base = (sequence_stats(ds, key="user_id", ts_col="ts",
                           tie_col="event_id", first_gap=-1)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    buck = (sequence_stats(ds, key="user_id", ts_col="ts",
                           tie_col="event_id", first_gap=-1,
                           bucket_s=86_400.0)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, buck[base.columns])
    # nullable-gap flavor too
    b2 = (sequence_stats(ds, key="user_id", ts_col="ts",
                         tie_col="event_id", bucket_s=86_400.0)
          .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert b2["gap_us"].isna().sum() == 3  # one first event per key


def test_rolling_stats_bucketed_parity_hot_key(ray_session):
    import ray.data as rd

    from rayxt.windows import rolling_stats

    df = _hot_events(1_000_000, 1, seed=5)  # single 10^6-row hot key
    ds = rd.from_pandas(df).repartition(16)
    kw = dict(key="user_id", ts_col="ts", tie_col="event_id",
              value_col="value", window=7)
    base = (rolling_stats(ds, **kw).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    buck = (rolling_stats(ds, bucket_s=86_400.0, **kw).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    assert len(base) == len(buck) == len(df)
    assert buck["event_id"].tolist() == base["event_id"].tolist()
    assert np.allclose(buck["roll_sum"], base["roll_sum"], atol=1e-6)
    assert np.allclose(buck["roll_avg"], base["roll_avg"], atol=1e-6)
    assert np.array_equal(buck["roll_max"], base["roll_max"])


def test_ordered_string_agg_bucketed_parity(ray_session):
    import ray.data as rd

    from rayxt.windows import ordered_string_agg

    df = _hot_events(20_000, 4)
    df["kind"] = np.where(df["value"] > 12, "a", "b")
    ds = rd.from_pandas(df).repartition(8)
    kw = dict(key="user_id", ts_col="ts", tie_col="event_id",
              cat_col="kind")
    base = (ordered_string_agg(ds, **kw).to_pandas()
            .sort_values("user_id").reset_index(drop=True))
    buck = (ordered_string_agg(ds, bucket_s=86_400.0, **kw).to_pandas()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, buck[base.columns])


def test_group_quantiles_by_value_parity(ray_session):
    import ray.data as rd

    from rayxt.windows import group_quantiles

    df = _hot_events(50_000, 3)
    ds = rd.from_pandas(df).repartition(8)
    kw = dict(key="user_id", value_col="value", qs=(0.25, 0.5, 0.95))
    base = (group_quantiles(ds, **kw).to_pandas()
            .sort_values("user_id").reset_index(drop=True))
    hist = (group_quantiles(ds, by_value=True, **kw).to_pandas()
            .sort_values("user_id").reset_index(drop=True))
    assert base["user_id"].tolist() == hist["user_id"].tolist()
    for c in ("p25", "p50", "p95"):
        assert np.allclose(base[c], hist[c], atol=1e-6)


def test_group_quantiles_nan_consistent_across_modes(ray_session):
    """A NaN-bearing group yields NaN quantiles in BOTH modes (the
    histogram path would otherwise sort NaNs last and only contaminate
    high quantiles); NaN-free groups are unaffected."""
    import ray.data as rd

    from rayxt.windows import group_quantiles

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 4,
        "value": [1.0, 2.0, np.nan, 4.0, 2.0, 1.0,
                  10.0, 20.0, 20.0, 40.0],
    })
    ds = rd.from_pandas(df).repartition(3)
    kw = dict(key="k", value_col="value", qs=(0.25, 0.5, 0.95))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        base = (group_quantiles(ds, **kw).to_pandas()
                .sort_values("k").reset_index(drop=True))
        hist = (group_quantiles(ds, by_value=True, **kw).to_pandas()
                .sort_values("k").reset_index(drop=True))
    for got in (base, hist):
        a = got[got["k"] == "a"]
        b = got[got["k"] == "b"]
        assert a[["p25", "p50", "p95"]].isna().all().all()
        assert not b[["p25", "p50", "p95"]].isna().any().any()
    for c in ("p25", "p50", "p95"):
        assert np.allclose(base[base["k"] == "b"][c],
                           hist[hist["k"] == "b"][c], atol=1e-6)


def test_range_rank_rejects_non_finite(ray_session):
    """NaN/±inf order values fail loudly instead of silently
    mis-bucketing (NaN fell into the zero bucket, inf overflowed the
    int64 bucket index)."""
    import ray.data as rd

    from rayxt.windows import range_rank

    for poison in (np.nan, np.inf, -np.inf):
        ds = rd.from_pandas(pd.DataFrame(
            {"v": [1.0, 2.0, poison], "id": [1, 2, 3]}))
        with pytest.raises(Exception, match="non-finite|NaN"):
            range_rank(ds, order_col="v", tie_col="id").to_pandas()


def test_range_rank_matches_bruteforce_high_cardinality(ray_session):
    """range_rank: exact ROW_NUMBER/NTILE over an all-distinct float
    column (the case global_rank's histogram guard rejects), plus
    negatives, zeros and heavy exact ties sharing one bucket."""
    import ray.data as rd

    from rayxt.windows import range_rank

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(0, 100, 3000),          # high-cardinality floats
        np.zeros(50),                       # exact zero ties
        np.full(75, -3.25),                 # negative exact ties
        rng.uniform(1e-8, 1e-6, 200),       # tiny magnitudes
    ])
    df = pd.DataFrame({"event_id": np.arange(len(vals), dtype=np.int64),
                       "value": vals})
    got = (range_rank(rd.from_pandas(df).repartition(7),
                      order_col="value", tie_col="event_id", ntile=7)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    want = df.sort_values(["value", "event_id"]).reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["rank"].tolist() == list(range(1, len(df) + 1))
    n, k = len(df), 7
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r)
    assert got["bucket"].tolist() == np.repeat(
        np.arange(1, k + 1), sizes).tolist()


def test_rollup_counts_matches_pandas(ray_session, ev_df):
    """GROUP BY ROLLUP parity: every prefix level present, rolled-up
    dims NULL, counts/sums exact."""
    import ray.data as rd

    from rayxt.windows import rollup_counts

    df = ev_df.copy()
    df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
    got = rollup_counts(rd.from_pandas(df).repartition(5),
                        dims=["kind", "day"], value_col="value")
    finest = df.groupby(["kind", "day"]).agg(
        n=("value", "size"), sum_v=("value", "sum")).reset_index()
    # level 2 rows
    lvl2 = got[got["day"].notna()]
    assert len(lvl2) == len(finest)
    m = lvl2.set_index(["kind", "day"])
    for _, r in finest.iterrows():
        assert m.loc[(r["kind"], r["day"]), "n"] == r["n"]
        assert abs(m.loc[(r["kind"], r["day"]), "sum_v"]
                   - round(r["sum_v"], 4)) < 1e-9
    # level 1: per-kind totals; level 0: grand total
    lvl1 = got[got["day"].isna() & got["kind"].notna()].set_index("kind")
    for kind, g in df.groupby("kind"):
        assert lvl1.loc[kind, "n"] == len(g)
    lvl0 = got[got["kind"].isna()]
    assert len(lvl0) == 1 and int(lvl0["n"].iloc[0]) == len(df)
