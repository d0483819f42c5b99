"""FIM transform: reconstruction identity, sentinel layout, md5 rate
determinism, passthrough edges, SPM mode, and the map-only plan pin."""
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.augment import fim_transform

V = 100          # toy vocab; sentinels 100/101/102
PRE, SUF, MID = V, V + 1, V + 2


def _bucket(key: str, n: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


def _mirror(doc_id, toks, rate_pct=100, seed=7, mode="psm"):
    n = len(toks)
    if not (_bucket(f"{doc_id}:fim0:{seed}", 100) < rate_pct and n >= 2):
        return False, toks
    c1 = _bucket(f"{doc_id}:fim1:{seed}", n + 1)
    c2 = c1 + _bucket(f"{doc_id}:fim2:{seed}", n - c1 + 1)
    p, m, s = toks[:c1], toks[c1:c2], toks[c2:]
    if mode == "psm":
        return True, [PRE] + p + [SUF] + s + [MID] + m
    return True, [PRE, SUF] + s + [MID] + p + m


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=i, tokens=list(range(3 + (i * 7) % 20)))
            for i in range(40)]
    rows += [Row(doc_id=100, tokens=[]), Row(doc_id=101, tokens=[5]),
             Row(doc_id=102, tokens=[1, 2])]
    return spark.createDataFrame(rows)


def test_matches_python_mirror_and_reconstructs(spark, docs):
    out = {r.doc_id: r for r in
           fim_transform(docs, vocab_size=V, rate_pct=100).collect()}
    for row in docs.collect():
        applied, want = _mirror(row.doc_id, row.tokens)
        got = out[row.doc_id]
        assert got.fim_applied == applied, row.doc_id
        assert got.fim_tokens == want, row.doc_id
        if applied:
            # PSM layout reconstructs the original: prefix+middle+suffix
            t = got.fim_tokens
            assert t[0] == PRE
            i_suf, i_mid = t.index(SUF), t.index(MID)
            prefix = t[1:i_suf]
            suffix = t[i_suf + 1:i_mid]
            middle = t[i_mid + 1:]
            assert prefix + middle + suffix == row.tokens


def test_spm_mode_reconstructs(spark, docs):
    out = fim_transform(docs, vocab_size=V, rate_pct=100, mode="spm") \
        .where("fim_applied").collect()
    assert out
    for got in out:
        t = got.fim_tokens
        assert t[0] == PRE and t[1] == SUF
        i_mid = t.index(MID)
        suffix, pm = t[2:i_mid], t[i_mid + 1:]
        orig = {r.doc_id: r.tokens
                for r in docs.collect()}[got.doc_id]
        assert pm + suffix == orig  # prefix+middle then suffix


def test_short_and_empty_pass_through(spark, docs):
    out = {r.doc_id: r for r in
           fim_transform(docs, vocab_size=V, rate_pct=100).collect()}
    assert out[100].fim_applied is False and out[100].fim_tokens == []
    assert out[101].fim_applied is False and out[101].fim_tokens == [5]
    assert out[102].fim_applied is True  # n=2 is transformable


def test_rate_selects_md5_fraction(spark, docs):
    out = fim_transform(docs, vocab_size=V, rate_pct=40).collect()
    for r in out:
        toks = {x.doc_id: x.tokens for x in docs.collect()}[r.doc_id]
        want = (_bucket(f"{r.doc_id}:fim0:7", 100) < 40
                and len(toks) >= 2)
        assert r.fim_applied == want
    # rate 0: nothing transforms
    assert fim_transform(docs, vocab_size=V, rate_pct=0) \
        .where("fim_applied").count() == 0


def test_plan_is_map_only(spark, docs):
    from tests.test_plan_shapes import plan_of
    plan = plan_of(fim_transform(docs, vocab_size=V, rate_pct=50))
    assert "Exchange" not in plan
    # no Python eval nodes (the scan line mentions Python for local data)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas", "Window"):
        assert node not in plan


def test_guards(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        fim_transform(docs, mode="pms")
    with pytest.raises(ValueError, match="rate_pct"):
        fim_transform(docs, rate_pct=101)
