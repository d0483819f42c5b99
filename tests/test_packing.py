"""Sequence packing: materialized windows byte-equal a local numpy oracle;
layout invariant to partitioning."""

import numpy as np

from msi_preprocessing_pipeline_spark.operators import spectrum as sp
from msi_preprocessing_pipeline_spark.operators.packing import (
    pack_assignments, pack_token_sequences)
from msi_preprocessing_pipeline_spark.sources import synthetic

BUDGET = 700


def _numpy_packing(rows, budget):
    """Local oracle: same layout rule (md5-band bucket, doc_id order,
    concat-and-chunk)."""
    import hashlib
    by_bucket: dict[str, list] = {}
    for doc_id, toks, _n, _src in rows:
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        by_bucket.setdefault(b, []).append((doc_id, np.asarray(toks)))
    out = {}
    for b, docs in by_bucket.items():
        stream = np.concatenate([t for _, t in sorted(docs)])
        for s in range(0, stream.size, budget):
            out[(b, s // budget)] = stream[s:s + budget]
    return out


def test_packed_windows_byte_equal_numpy_oracle(spark):
    from msi_preprocessing_pipeline_spark.kernels import synth

    sources = {"src-000": 12, "src-001": 10}
    df = synthetic.sequences_df(spark, sources, base_channels=256)
    rows = synth.make_table(sources, base_channels=256)
    got = pack_token_sequences(df, BUDGET).toPandas()
    expected = _numpy_packing(rows, BUDGET)
    assert len(got) == len(expected)
    for r in got.itertuples():
        exp = expected[(r.bucket, r.seq_no)]
        assert np.asarray(r.tokens, dtype=np.int32).tobytes() \
            == exp.astype(np.int32).tobytes(), (r.bucket, r.seq_no)
    # every window except each bucket's tail is exactly BUDGET tokens
    tail = got.groupby("bucket")["seq_no"].transform("max") == got["seq_no"]
    assert (got.loc[~tail, "n_tok"] == BUDGET).all()
    assert (got.loc[tail, "n_tok"] <= BUDGET).all()


def test_pack_assignments_partition_invariant(spark):
    df = synthetic.sequences_df(spark, {"src-000": 30}, base_channels=128)
    a = pack_assignments(df, 500).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = pack_assignments(df.repartition(17), 500).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # offsets are consistent: within a bucket, start_offset is the running
    # sum of preceding docs and offset_in_seq = start % budget
    for _, grp in a.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        assert (grp.start_offset.values
                == np.concatenate(([0], grp.n_tok.values[:-1].cumsum()))).all()
        assert (grp.offset_in_seq == grp.start_offset % 500).all()
    _ = sp


def test_packing_with_empty_and_tiny_docs(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [
        ("a", [1, 2, 3], 3),
        ("b", [], 0),           # empty doc: occupies no tokens
        ("c", [4] * 10, 10),
        ("d", [5], 1),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok"])
    df = spark.createDataFrame(pdf, schema="doc_id string, "
                                           "tokens array<int>, n_tok int")
    asg = pack_assignments(df, budget=4).toPandas().set_index("doc_id")
    # empty doc still gets a well-defined window (its start window)
    assert asg.loc["b", "first_seq"] == asg.loc["b", "last_seq"]
    seqs = pack_token_sequences(df, budget=4).toPandas()
    # total tokens conserved; every non-tail window exactly 4
    assert int(seqs.n_tok.sum()) == 14
    tail = seqs.groupby("bucket")["seq_no"].transform("max") == seqs["seq_no"]
    assert (seqs.loc[~tail, "n_tok"] == 4).all()
