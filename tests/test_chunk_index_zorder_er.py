"""Session-4 operators: chunk_tokens, postings/index_stats, autocorr,
zorder_key, entity-resolution blocking — behavior + plan-shape pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.functions.util import (
    zorder_key, zorder_sql)
from msi_preprocessing_pipeline_spark.operators.er import (
    candidate_pairs, rarest_word_blocks)
from msi_preprocessing_pipeline_spark.operators.lm import (
    index_stats, postings)
from msi_preprocessing_pipeline_spark.operators.packing import chunk_tokens
from msi_preprocessing_pipeline_spark.operators.sequences import autocorr


# ---------------------------------------------------------------------------
# chunk_tokens


def _chunks_py(tokens, chunk_len, stride, min_len):
    if not tokens:
        return []
    out = []
    for cid, start in enumerate(range(0, len(tokens), stride)):
        c = tokens[start:start + chunk_len]
        if len(c) >= min_len:
            out.append((cid, tuple(c)))
    return out


def test_chunk_tokens_matches_python_reference(spark):
    rng = np.random.RandomState(11)
    rows = [(i, [int(t) for t in rng.randint(0, 50, rng.randint(0, 40))])
            for i in range(60)] + [(60, []), (61, None)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    for chunk_len, stride, min_len in [(8, 8, 1), (8, 5, 1), (8, 5, 4),
                                       (1, 1, 1), (16, 3, 16)]:
        got = {}
        for r in chunk_tokens(df, chunk_len, stride, min_len).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], tuple(r["chunk_tokens"])))
            assert r["chunk_n"] == len(r["chunk_tokens"])
        for i, toks in rows:
            exp = _chunks_py(toks or [], chunk_len, stride, min_len)
            assert sorted(got.get(i, [])) == exp, (i, chunk_len, stride)


def test_chunk_tokens_stride_defaults_to_disjoint(spark):
    df = spark.createDataFrame([(1, list(range(10)))],
                               "doc_id long, tokens array<int>")
    out = sorted((r["chunk_id"], tuple(r["chunk_tokens"]))
                 for r in chunk_tokens(df, chunk_len=4).collect())
    assert out == [(0, (0, 1, 2, 3)), (1, (4, 5, 6, 7)), (2, (8, 9))]


def test_chunk_tokens_validates_args(spark):
    df = spark.createDataFrame([(1, [1])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_len=0)
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_len=4, stride=0)


def test_chunk_tokens_is_map_only(spark):
    df = spark.createDataFrame([(1, [1, 2, 3])],
                               "doc_id long, tokens array<int>")
    plan = chunk_tokens(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# postings / index_stats


def test_postings_positions_and_tf(spark):
    df = spark.createDataFrame([(1, [5, 7, 5, 5]), (2, [7]), (3, [])],
                               "doc_id long, tokens array<int>")
    got = {(r["t"], r["doc_id"]): (r["tf"], list(r["positions"]))
           for r in postings(df).collect()}
    assert got == {(5, 1): (3, [1, 3, 4]), (7, 1): (1, [2]),
                   (7, 2): (1, [1])}


def test_index_stats_topk_cap_and_order(spark):
    df = spark.createDataFrame(
        [(1, [9, 9, 9]), (2, [9, 9]), (3, [9, 9]), (4, [9]), (5, [1])],
        "doc_id long, tokens array<int>")
    row = {r["t"]: r for r in index_stats(df, top_k=2).collect()}
    assert (row[9]["df"], row[9]["cf"]) == (4, 8)
    # tf desc, id asc tiebreak; capped at 2
    assert [(d["id"], d["tf"]) for d in row[9]["top_docs"]] == [(1, 3), (2, 2)]
    assert (row[1]["df"], row[1]["cf"]) == (1, 1)


def test_index_stats_without_topk_skips_window(spark):
    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    plan = index_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# autocorr


def test_autocorr_matches_numpy_on_quantized_series(spark):
    rng = np.random.RandomState(3)
    rows = []
    series = {}
    for uid in range(6):
        n = rng.randint(3, 40)
        vals = np.round(rng.uniform(-50, 50, n), 4)
        series[uid] = vals
        rows += [(uid, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid long, ts long, value double")
    got = {(r["uid"], r["lag"]): (r["n_pairs"], r["r"])
           for r in autocorr(df, "value", "uid", "ts", lags=[1, 3]).collect()}
    for uid, vals in series.items():
        q = np.floor(vals * 1e6 + 0.5)
        for k in (1, 3):
            if len(q) <= k:
                assert (uid, k) not in got
                continue
            x, y = q[k:], q[:-k]
            n_pairs, r = got[(uid, k)]
            assert n_pairs == len(x)
            exp = np.corrcoef(x, y)[0, 1]
            if np.isnan(exp):
                assert r is None
            else:
                assert r == pytest.approx(exp, abs=1e-9), (uid, k)


def test_autocorr_skips_null_values_before_lagging(spark):
    # observed series of uid 1 is [1, 2, 3] (null dropped) -> lag1 r = 1
    rows = [(1, 0, 1.0), (1, 1, None), (1, 2, 2.0), (1, 3, 3.0)]
    df = spark.createDataFrame(rows, "uid long, ts long, value double")
    out = autocorr(df, "value", "uid", "ts", lags=[1]).collect()
    assert len(out) == 1 and out[0]["n_pairs"] == 2
    assert out[0]["r"] == pytest.approx(1.0)


def test_autocorr_constant_series_null_r(spark):
    df = spark.createDataFrame([(1, i, 7.0) for i in range(5)],
                               "uid long, ts long, value double")
    out = autocorr(df, "value", "uid", "ts").collect()
    assert out[0]["n_pairs"] == 4 and out[0]["r"] is None


def test_autocorr_validates_lags(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "uid long, ts long, value double")
    for bad in ([], [0], [-1]):
        with pytest.raises(ValueError):
            autocorr(df, "value", "uid", "ts", lags=bad)


def test_autocorr_single_window_node(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "uid long, ts long, value double")
    plan = (autocorr(df, "value", "uid", "ts", lags=[1, 2, 5])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("+- Window") == 1


# ---------------------------------------------------------------------------
# zorder


def _spread_py(v, bits):
    v &= (1 << bits) - 1
    out = 0
    for i in range(bits):
        out |= ((v >> i) & 1) << (2 * i)
    return out


def test_zorder_matches_python_and_duckdb(spark):
    import duckdb
    rng = np.random.RandomState(5)
    pts = [(int(x), int(y)) for x, y in
           zip(rng.randint(0, 1 << 16, 40), rng.randint(0, 1 << 16, 40))]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 16).alias("z")).collect()}
    con = duckdb.connect()
    expr = zorder_sql("x", "y", 16)
    for x, y in pts:
        exp = _spread_py(x, 16) | (_spread_py(y, 16) << 1)
        assert got[(x, y)] == exp
        zd = con.sql(f"select {expr} from (select {x} as x, {y} as y)"
                     ).fetchone()[0]
        assert zd == exp, (x, y)


def test_zorder_masks_out_of_range_and_validates_bits(spark):
    df = spark.createDataFrame([((1 << 20) + 5, 3)], "x long, y long")
    z = df.select(zorder_key(F.col("x"), F.col("y"), 8).alias("z")).first()["z"]
    assert z == _spread_py(5, 8) | (_spread_py(3, 8) << 1)
    with pytest.raises(ValueError):
        zorder_key(F.col("x"), F.col("y"), 32)
    with pytest.raises(ValueError):
        zorder_sql("x", "y", 0)


def test_zorder_clusters_2d_neighborhoods(spark):
    """Locality property that makes z-order a layout key: a small 2-d
    tile maps into a bounded z-range (tiles are contiguous at
    power-of-two alignment), so parquet min/max stats can prune
    two-predicate scans."""
    for tx in (0, 3, 17):
        for ty in (0, 5, 9):
            zs = [_spread_py(tx * 8 + dx, 16)
                  | (_spread_py(ty * 8 + dy, 16) << 1)
                  for dx in range(8) for dy in range(8)]
            assert max(zs) - min(zs) == 63  # 8x8 aligned tile -> 64 contiguous keys


# ---------------------------------------------------------------------------
# entity resolution


def test_rarest_word_block_is_deterministic_min(spark):
    # 'beta' appears twice, 'alpha' once, 'aaa' once: doc 1 ties between
    # 'alpha' and 'aaa' on df=1 -> lexicographic 'aaa' wins
    df = spark.createDataFrame([(1, "beta alpha aaa"), (2, "beta x")],
                               "id long, name string")
    got = {r["id"]: r["block"]
           for r in rarest_word_blocks(df, "name", "id").collect()}
    assert got[1] == "aaa" and got[2] == "x"


def test_candidate_pairs_threshold_and_uniqueness(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "alpha beta gamme"), (4, "alpha beta ZZZZZZZZZZ"),
         (5, None), (6, "   ")],
        "id long, name string")
    out = candidate_pairs(df, "name", "id", max_dist=1, max_block=100)
    rows = sorted((r["id_a"], r["id_b"], r["dist"]) for r in out.collect())
    # 1,2,3 share rarest word 'alpha'? all words df: alpha 4, beta 4,
    # gamma 2, gamme 1, zzz 1 -> doc3 blocks on 'gamme', doc4 on the Z
    # word, docs 1,2 on 'gamma'. Only (1,2) is same-block within dist 1.
    assert rows == [(1, 2, 0)]
    assert len(rows) == len({(a, b) for a, b, _ in rows})


def test_candidate_pairs_max_block_guard_drops_big_blocks(spark):
    df = spark.createDataFrame([(i, "same words here") for i in range(12)],
                               "id long, name string")
    assert candidate_pairs(df, "name", "id", 2, max_block=5).count() == 0
    assert candidate_pairs(df, "name", "id", 2, max_block=12).count() == 66
    with pytest.raises(ValueError):
        candidate_pairs(df, "name", "id", max_dist=-1)


# ---------------------------------------------------------------------------
# trend_features


def test_trend_matches_numpy_ols(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        trend_features)
    rng = np.random.RandomState(11)
    rows, series = [], {}
    for uid in range(6):
        n = rng.randint(2, 40)
        ts = np.sort(rng.randint(0, 10**7, n))
        vals = np.round(rng.uniform(-50, 50, n), 4)
        series[uid] = (ts, vals)
        rows += [(uid, int(t), float(v)) for t, v in zip(ts, vals)]
    rows += [(99, 5, None), (98, None, 1.0)]  # fully-null entities vanish
    df = spark.createDataFrame(rows, "uid long, ms long, value double")
    got = {r["uid"]: r for r in
           trend_features(df, "value", "uid", "ms").collect()}
    assert 99 not in got and 98 not in got
    for uid, (ts, vals) in series.items():
        q = np.floor(vals * 1e6 + 0.5)
        x = (ts - ts.min()).astype(float)
        r = got[uid]
        assert r["n_obs"] == len(ts) and r["t0"] == ts.min()
        if len(set(ts.tolist())) < 2:
            assert r["slope"] is None
            continue
        slope_q, icept_q = np.polyfit(x, q, 1)
        assert r["slope"] == pytest.approx(slope_q * 1000 / 1e6, rel=1e-9)
        assert r["intercept"] == pytest.approx(icept_q / 1e6, rel=1e-7)
        cc = np.corrcoef(x, q)[0, 1]
        if np.isnan(cc):
            assert r["r2"] is None
        else:
            assert r["r2"] == pytest.approx(cc * cc, abs=1e-9)


def test_trend_degenerate_cases(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        trend_features)
    rows = [(1, 100, 5.0),              # single obs
            (2, 200, 1.0), (2, 200, 9.0),   # constant time, two obs
            (3, 0, 2.0), (3, 1000, 2.0)]    # constant value: slope 0, r2 null
    df = spark.createDataFrame(rows, "uid long, ms long, value double")
    got = {r["uid"]: r for r in
           trend_features(df, "value", "uid", "ms").collect()}
    assert got[1]["n_obs"] == 1 and got[1]["slope"] is None
    assert got[2]["slope"] is None and got[2]["r2"] is None
    assert got[3]["slope"] == pytest.approx(0.0)
    assert got[3]["intercept"] == pytest.approx(2.0)
    assert got[3]["r2"] is None
    with pytest.raises(ValueError):
        trend_features(df, "value", "uid", "ms", scale=-1)


def test_trend_timestamp_column(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        trend_features)
    df = spark.sql("""
        select * from values
          (1, timestamp'2024-01-01 00:00:00', 1.0),
          (1, timestamp'2024-01-01 00:00:10', 2.0),
          (1, timestamp'2024-01-01 00:00:20', 3.0)
        as t(uid, ts, value)""")
    r = trend_features(df, "value", "uid", "ts").collect()[0]
    assert r["slope"] == pytest.approx(0.1)   # +1 value per 10 s
    assert r["intercept"] == pytest.approx(1.0)
    assert r["r2"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# resolve_entities


def test_resolve_entities_transitive_clusters_and_canonical(spark):
    from msi_preprocessing_pipeline_spark.operators.er import (
        resolve_entities)
    # the zephyr records share their corpus-rarest word (zephyr df=3;
    # every other token df>=5 via background records), so they block
    # together; chain 1~2 (dist 1), 2~3 (dist 1), 1-3 dist 2 > 1 —
    # one cluster by transitive closure
    rows = [(1, "zephyr aaa bbb"),
            (2, "zephyr aaa bbc"),
            (3, "zephyr aaa bbcx"),
            (5, None),
            (None, "ghost uniq0")]
    rows += [(10 + i, f"aaa bbb bbc bbcx uniq{i + 1}") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {r["id"]: r for r in
           resolve_entities(df, "name", "id", max_dist=1).collect()}
    assert set(out) == {1, 2, 3, 5, 10, 11, 12, 13}   # null id dropped
    assert {out[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    # canonical = longest name in the cluster (id 3), not min id
    assert all(out[i]["canonical_id"] == 3 for i in (1, 2, 3))
    assert all(out[i]["n_members"] == 3 for i in (1, 2, 3))
    for i in (5, 10, 11, 12, 13):  # singletons are their own canonical
        assert (out[i]["cluster_id"], out[i]["canonical_id"],
                out[i]["n_members"]) == (i, i, 1)


def test_resolve_entities_canonical_tiebreak_min_id(spark):
    from msi_preprocessing_pipeline_spark.operators.er import (
        resolve_entities)
    df = spark.createDataFrame(
        [(7, "qux aaa"), (9, "qux aab"),
         (20, "aaa aab zz1"), (21, "aaa aab zz2")], "id long, name string")
    out = {r["id"]: r for r in
           resolve_entities(df, "name", "id", max_dist=1).collect()}
    # equal name lengths -> smaller id wins the canonical pick
    assert (out[7]["cluster_id"], out[7]["canonical_id"]) == (7, 7)
    assert (out[9]["cluster_id"], out[9]["canonical_id"]) == (7, 7)


# ---------------------------------------------------------------------------
# survivorship_merge


def test_survivorship_merge_field_level_latest_non_null(spark):
    from msi_preprocessing_pipeline_spark.operators.er import (
        survivorship_merge)
    rows = [
        # cluster 1: email latest at t3 from row B, phone only on row A
        (1, 1, "a@x.com", "111"),
        (1, 3, "b@x.com", None),
        (1, 2, None, None),
        # cluster 2: everything null -> stays null
        (2, 5, None, None),
    ]
    df = spark.createDataFrame(rows, "cid long, ts long, email string,"
                                     " phone string")
    got = {r["cid"]: r for r in
           survivorship_merge(df, "cid", "ts",
                              ["email", "phone"]).collect()}
    assert (got[1]["email"], got[1]["phone"], got[1]["n_members"]) \
        == ("b@x.com", "111", 3)
    assert (got[2]["email"], got[2]["phone"], got[2]["n_members"]) \
        == (None, None, 1)
    import pytest as pt
    with pt.raises(ValueError):
        survivorship_merge(df, "cid", "ts", [])


def test_survivorship_merge_tie_breaks_by_value(spark):
    from msi_preprocessing_pipeline_spark.operators.er import (
        survivorship_merge)
    df = spark.createDataFrame([(1, 7, "aa"), (1, 7, "zz")],
                               "cid long, ts long, v string")
    r = survivorship_merge(df, "cid", "ts", "v").collect()[0]
    assert r["v"] == "zz"  # same ts: max value wins, deterministic


# ---------------------------------------------------------------------------
# gap_stats


def test_gap_stats_matches_numpy(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        gap_stats)
    rng = np.random.RandomState(17)
    rows, series = [], {}
    for uid in range(5):
        ts = np.sort(rng.choice(10**6, size=rng.randint(1, 30),
                                replace=False))
        series[uid] = ts
        rows += [(uid, int(t)) for t in ts]
    rows += [(9, None)]
    df = spark.createDataFrame(rows, "uid long, ms long")
    got = {r["uid"]: r for r in
           gap_stats(df, "uid", "ms", threshold_ms=50_000).collect()}
    assert 9 not in got
    for uid, ts in series.items():
        gaps = np.diff(ts)
        r = got[uid]
        assert (r["n_obs"], r["n_gaps"]) == (len(ts), len(gaps))
        if len(gaps) == 0:
            assert r["max_gap_ms"] is None and r["median_gap_ms"] is None
            assert r["n_gaps_over"] == 0
        else:
            assert r["max_gap_ms"] == gaps.max()
            assert r["median_gap_ms"] == pytest.approx(
                np.percentile(gaps, 50))
            assert r["n_gaps_over"] == int((gaps > 50_000).sum())


def test_gap_stats_validation(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        gap_stats)
    df = spark.createDataFrame([(1, 1)], "uid long, ms long")
    with pytest.raises(ValueError):
        gap_stats(df, "uid", "ms", threshold_ms=-1)
