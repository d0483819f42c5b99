"""Generate pinned VALUES oracles for the deterministic rows-only queries.

Runs each query (driver-like session: 32 cores) and emits DuckDB SQL that
reproduces the exact output — literals carry full float precision (repr).
Writes _golden_oracles.py at the repo root. Lives in tools/ (committed).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# queries to pin: (name, sf_dependent)
PIN = [
    # logistic quality classifier: fit is partition-invariant by exact
    # decimal gradient sums; σ uses exp (not cross-libm exact) so the
    # contract is pinned rather than mirrored in SQL
    ("logreg_quality_docs", True),
    ("pit_features", False),
    ("batch_features", False),
    ("smooth_and_peaks", False),
    ("tic_outlier_mask", False),
    ("minhash_pairs", True),
    ("near_dup_clusters", True),
    ("simhash_pairs", True),
    ("winnowing_pairs", True),
    # ANN queries: seeded-deterministic end to end (hyperplanes/centroids
    # from seeded RNGs; ivf_fit_centroids is partition-invariant by
    # hash-band sampling + id-sorted collect; ties broken by neighbor id)
    ("lsh_topk", True),
    ("ivf_topk", True),
    ("embedding_near_dup", True),
    # HLL estimates: DataSketches register-max merge is commutative and
    # associative, so the estimate is partition/merge-order invariant
    ("approx_distinct_users", True),
    # CMS: elementwise-add merge, same invariance
    ("cms_user_event_counts", True),
    # BPE: driver fit over the collected word histogram with explicit
    # (count, lexicographic) tie-breaks — collect-order independent
    ("bpe_tokenize_docs", True),
    # PCA: fit is partition-order-invariant (12-dp covariance/mean
    # rounding before eigh, deterministic component signs)
    ("pca_project_vecs", True),
    # k-core: the k-core is a unique fixpoint (peeling order never
    # matters) — deterministic, but iterative peeling is not
    # expressible in non-recursive SQL, hence a pinned golden
    ("kcore_suppliers", True),
    # incremental minhash: same xxhash64 banding as minhash_pairs (not
    # SQL-expressible); equivalence to the one-shot run is pytest-pinned
    ("incremental_minhash_pairs", True),
    # pHash: per-row numpy DCT over deterministic synthetic images —
    # partitioning-invariant, pinned like the ANN family
    ("phash_near_dup", True),
    # distributed k-means: quantized exact-integer centroid sums make the
    # fit partitioning-invariant (pytest-verified); iterative → golden
    ("kmeans_vecs", True),
    # SemDeDup: k-means fit is iterative (golden like kmeans_vecs); the
    # dedup verdict is exact-integer and pytest-pinned partition-invariant
    ("semdedup_vecs", True),
    # DSIR: λ table is a driver-side numpy ln over exact bucket counts —
    # deterministic, but DuckDB's ln differs from numpy's at 1 ulp, so the
    # quantized λ has no stable SQL mirror; weights are exact int64 sums
    ("dsir_weights_docs", True),
    # PQ: iterative codebook fit (kmeans determinism contract); encode +
    # exact-int ADC ranking are partition-invariant, pytest-pinned
    ("pq_topk_vecs", True),
    # weighted reservoir sampling: per-row race key = -ln(md5 u)/w — the
    # JVM ln has no ulp-stable DuckDB mirror (dsir precedent); selection
    # determinism is pytest-pinned under repartitioning
    ("weighted_sample_docs", True),
    # MMR: greedy diversified re-rank over exact-int cosine keys with an
    # integer-percent λ — every selection step compares exact int64
    # scores (pytest-pinned partition-invariant; pure-python mirror),
    # but the k-step greedy loop is iterative → golden, like kmeans
    ("mmr_rerank_vecs", True),
    # unigram-LM tokenizer: hard-EM fit with exact integer piece counts
    # and fixed tie orders is partitioning-invariant (pytest-pinned); the
    # per-iteration numpy ln quantization has no ulp-stable SQL mirror
    # (dsir precedent) and Viterbi DP is not SQL-expressible → golden
    ("unigram_fit_docs", True),
    ("unigram_tokenize_docs", True),
    # isotonic/PAV calibration: exact-rational pooling is partition-
    # invariant (pytest-pinned) but the pooling fixpoint is iterative
    # and data-dependent — not expressible in non-recursive SQL → golden
    ("isotonic_value_purchase", True),
    # rank-gauss: Φ⁻¹ is the repo's numpy kernel (no SQL mirror); ranks
    # are a total order so the transform is partition-invariant → golden
    ("rank_gauss_events", True),
    # zlib compression ratio: deterministic for a fixed level + zlib
    # build, but DuckDB has no zlib → golden
    ("compression_ratio_docs", True),
    # Mahalanobis: fit is partition-invariant (12-dp rounding before the
    # driver inverse, pca_fit discipline) but the matrix inverse has no
    # SQL mirror → golden
    ("mahalanobis_vecs", True),
    # GMM selectivity: exact-int histogram + deterministic EM init →
    # partition-invariant, but EM has no SQL mirror → golden
    ("selectivity_events_value", True),
]

DUCK_TYPES = {
    "object": "varchar", "int64": "bigint", "int32": "int",
    "float64": "double", "float32": "double", "bool": "boolean",
}


def lit(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "null"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(int(v))


def main():
    import __spark_entry__ as em
    from msi_preprocessing_pipeline_spark.session import build_session
    spark = build_session("goldens", parallelism=32, shuffle_partitions=32)
    out = {}
    for name, sf_dep in PIN:
        pdf = em.queries()[name](spark, SF_DIR).toPandas()
        cols = list(pdf.columns)
        types = [DUCK_TYPES[str(pdf[c].dtype)] for c in cols]
        rows = []
        for t in pdf.itertuples(index=False):
            rows.append("(" + ", ".join(lit(v) for v in t) + ")")
        casts = ", ".join(
            f"cast(c{i} as {ty}) as {c}"
            for i, (c, ty) in enumerate(zip(cols, types)))
        colnames = ", ".join(f"c{i}" for i in range(len(cols)))
        sql = (f"select {casts} from (values\n  "
               + ",\n  ".join(rows)
               + f"\n) as t({colnames})")
        tag = ("pinned at sf0.01 documents/embeddings input"
               if sf_dep else "input synthesized in-process (sf-independent)")
        out[name] = (sql, tag, len(pdf))
        print(f"{name}: {len(pdf)} rows pinned ({tag})", flush=True)
    spark.stop()

    with open("/root/repo/_golden_oracles.py", "w") as f:
        f.write('"""Generated golden oracles (regenerate with '
                'tools/gen_goldens.py).\n\nEach entry pins the exact, '
                'seeded-deterministic output of a non-SQL-expressible\n'
                'operator (PIT pipeline, sketch dedup) as a DuckDB VALUES '
                'relation so the\ndriver can hash-check it like any '
                'relational query.\n"""\n\n')
        f.write("GOLDEN_ORACLES = {\n")
        for name, (sql, tag, n) in out.items():
            f.write(f"    # {n} rows; {tag}\n")
            f.write(f"    {name!r}: '''\n{sql}\n''',\n")
        f.write("}\n\n")
        f.write("# goldens whose pinned values depend on the sf0.01 input "
                "tables\n")
        # emit SORTED (a set repr is hash-order-randomized per process:
        # every regen would churn the whole line and mask real
        # membership changes in review)
        sf_dep = sorted(name for name, dep in PIN if dep)
        f.write("SF001_PINNED = {\n")
        for name in sf_dep:
            f.write(f"    {name!r},\n")
        f.write("}\n")
    print("written _golden_oracles.py")


if __name__ == "__main__":
    main()
