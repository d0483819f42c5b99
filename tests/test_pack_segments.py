"""pack_with_segments: tokens byte-equal pack_token_sequences, segment
ids are block-ordinal, position ids restart per doc and resume across
straddled windows; python mirror parity and partition invariance."""
import hashlib

import numpy as np
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.packing import (
    pack_token_sequences, pack_with_segments)

BUDGET = 7


def _docs(spark):
    rows = [
        Row(doc_id=i, tokens=list(range(100 * i, 100 * i + n)),
            n_tok=n)
        for i, n in [(1, 5), (2, 9), (3, 0), (4, 3), (5, 16), (6, 1),
                     (7, 4)]
    ]
    return spark.createDataFrame(
        rows, "doc_id int, tokens array<int>, n_tok int")


def _mirror(rows, budget):
    by_bucket = {}
    for doc_id, toks in rows:
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        by_bucket.setdefault(b, []).append((doc_id, toks))
    out = {}
    for b, docs in by_bucket.items():
        stream = []   # (token, seg_ordinal_key=doc order, in-doc pos)
        for doc_id, toks in sorted(docs):
            for j, t in enumerate(toks):
                stream.append((t, doc_id, j))
        for s in range(0, max(len(stream), 1), budget):
            win = stream[s:s + budget]
            if not win:
                continue
            segs, seen = [], {}
            for _t, d, _j in win:
                if d not in seen:
                    seen[d] = len(seen) + 1
                segs.append(seen[d])
            out[(b, s // budget)] = (
                [t for t, _, _ in win], segs, [j for _, _, j in win])
    return out


def test_segments_match_python_mirror(spark):
    df = _docs(spark)
    rows = [(r["doc_id"], r["tokens"]) for r in df.collect()]
    exp = _mirror(rows, BUDGET)
    got = pack_with_segments(df, BUDGET).collect()
    got_map = {(r["bucket"], r["seq_no"]):
               (r["tokens"], r["segment_ids"], r["position_ids"])
               for r in got if r["n_tok"] > 0}
    assert got_map == exp
    for r in got:
        assert r["n_tok"] == len(r["tokens"])
        assert r["n_segments"] == len(set(r["segment_ids"]))


def test_tokens_agree_with_pack_token_sequences(spark):
    df = _docs(spark)
    a = {(r["bucket"], r["seq_no"]): r["tokens"]
         for r in pack_token_sequences(df, BUDGET).collect()}
    b = {(r["bucket"], r["seq_no"]): r["tokens"]
         for r in pack_with_segments(df, BUDGET).collect()}
    assert a == b


def test_position_ids_resume_across_straddle(spark):
    # one bucket: a single 16-token doc forced to straddle windows
    df = spark.createDataFrame(
        [Row(doc_id=5, tokens=list(range(16)), n_tok=16)],
        "doc_id int, tokens array<int>, n_tok int")
    got = sorted(pack_with_segments(df, BUDGET).collect(),
                 key=lambda r: r["seq_no"])
    flat_pos = [p for r in got for p in r["position_ids"]]
    assert flat_pos == list(range(16))
    assert all(set(r["segment_ids"]) == {1} for r in got)


def test_partition_invariance(spark):
    df = _docs(spark)
    a = sorted(map(tuple, pack_with_segments(df, BUDGET).collect()))
    b = sorted(map(tuple,
                   pack_with_segments(df.repartition(13), BUDGET)
                   .collect()))
    assert a == b
