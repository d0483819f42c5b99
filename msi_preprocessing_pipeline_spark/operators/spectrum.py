"""Spectrum feature-stage operators — vectorized Arrow UDFs over broadcast
artifacts.

Each operator is the Spark expression of one reference pipeline stage
(SURVEY.md §2.6/§2.9). The shape is always the same: small artifacts
(axis / reference vector / GMM model) are broadcast; rows stream through
``mapInPandas`` in Arrow batches; the numerical kernel is the SAME module the
numpy oracle uses (``..kernels``), so parity is arithmetic-identical modulo
float64 aggregation order.

No per-row Python at the DataFrame level: the per-row loops live inside the
UDF over numpy arrays (the reference's ``Pool.map(chunksize=800)`` analog is
``spark.sql.execution.arrow.maxRecordsPerBatch=800``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..kernels import alignment, axis as axis_k, baseline as baseline_k
from ..kernels import convolve as convolve_k, merge as merge_k
from ..kernels import outlier as outlier_k
from ..oracle import PipelineConfig
from .quantiles import COLLECT_THRESHOLD, matlab_quantiles


@dataclass
class ArtifactSet:
    """Everything the serving path needs, one version. Broadcast-able."""

    version: int
    valid_from_ts: int
    mz_axis: np.ndarray
    b1: float
    b2: float
    pafft_reference: np.ndarray
    tic_reference_tic: float
    gmm_mu: np.ndarray
    gmm_sig: np.ndarray
    gmm_w: np.ndarray
    merge_starts: np.ndarray
    merge_lengths: np.ndarray

    def to_row(self) -> dict:
        return {
            "version": self.version,
            "valid_from_ts": self.valid_from_ts,
            "mz_axis": self.mz_axis.tolist(),
            "b1": self.b1, "b2": self.b2,
            "pafft_reference": self.pafft_reference.tolist(),
            "tic_reference_tic": self.tic_reference_tic,
            "gmm_mu": self.gmm_mu.tolist(),
            "gmm_sig": self.gmm_sig.tolist(),
            "gmm_w": self.gmm_w.tolist(),
            "merge_starts": [int(x) for x in self.merge_starts],
            "merge_lengths": [int(x) for x in self.merge_lengths],
        }

    @staticmethod
    def from_row(row: dict) -> "ArtifactSet":
        return ArtifactSet(
            version=int(row["version"]),
            valid_from_ts=int(row["valid_from_ts"]),
            mz_axis=np.asarray(row["mz_axis"], dtype=float),
            b1=float(row["b1"]), b2=float(row["b2"]),
            pafft_reference=np.asarray(row["pafft_reference"], dtype=float),
            tic_reference_tic=float(row["tic_reference_tic"]),
            gmm_mu=np.asarray(row["gmm_mu"], dtype=float),
            gmm_sig=np.asarray(row["gmm_sig"], dtype=float),
            gmm_w=np.asarray(row["gmm_w"], dtype=float),
            merge_starts=np.asarray(row["merge_starts"], dtype=np.int64),
            merge_lengths=np.asarray(row["merge_lengths"], dtype=np.int64),
        )

# --------------------------------------------------------------------------
# Arrow-native helpers: the hot-path UDFs run via mapInArrow on raw
# RecordBatches — list columns are consumed as (flat values, offsets) numpy
# views and produced from contiguous matrices, skipping the pandas
# object-column round trip (measured ~2× lower per-pass overhead than
# mapInPandas at 2048-channel rows).

def _list_col_np(batch: "pa.RecordBatch", name: str):
    """(flat_values, offsets) numpy views of a list column; row i is
    ``flat[offs[i]:offs[i+1]]`` (zero-copy for non-null primitive lists)."""
    col = batch.column(batch.schema.names.index(name))
    flat = col.values.to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    return flat, offs


def _uniform_list_array(mat: np.ndarray) -> "pa.ListArray":
    """Arrow list array from a contiguous [n, w] matrix (one memcpy)."""
    n, w = mat.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int64) * w,
                       type=pa.int32())
    return pa.ListArray.from_arrays(offsets, pa.array(mat.ravel()))


_BANDS_CACHE: dict[tuple, "convolve_k.ComponentBands"] = {}


def _bands_for(art: "ArtifactSet") -> "convolve_k.ComponentBands":
    """Per-worker-process cache of the banded Gaussian design.

    ``build_bands`` runs per (axis, model); without this cache every TASK
    paid it (reused Python workers run many tasks), a fixed cost that grows
    with task count and erodes scaling efficiency at high parallelism."""
    key = (art.version, art.valid_from_ts, art.gmm_mu.size,
           hash(art.gmm_mu.tobytes()), hash(art.mz_axis.tobytes()))
    bands = _BANDS_CACHE.get(key)
    if bands is None:
        bands = convolve_k.build_bands(art.mz_axis, art.gmm_mu, art.gmm_sig,
                                       art.gmm_w)
        if len(_BANDS_CACHE) > 16:
            _BANDS_CACHE.clear()
        _BANDS_CACHE[key] = bands
    return bands


ARTIFACT_SCHEMA = (
    "version int, valid_from_ts long, mz_axis array<double>, b1 double, "
    "b2 double, pafft_reference array<double>, tic_reference_tic double, "
    "gmm_mu array<double>, gmm_sig array<double>, gmm_w array<double>, "
    "merge_starts array<long>, merge_lengths array<long>"
)


def with_ts(df: DataFrame, config: PipelineConfig | None = None) -> DataFrame:
    """Derive event time: rank of ``doc_id`` within ``source`` on the fixed
    epoch grid (FIXTURES.md F1). One shuffle on source."""
    config = config or PipelineConfig()
    w = Window.partitionBy("source").orderBy("doc_id")
    return df.withColumn(
        "ts",
        (F.lit(config.epoch_base)
         + (F.row_number().over(w) - 1) * F.lit(config.epoch_step)).cast("long"))


def resample_baseline_stage(df: DataFrame, source_axes: dict[str, np.ndarray],
                            new_axis: np.ndarray,
                            config: PipelineConfig) -> DataFrame:
    """Stages 2+3 fused: per-row resample onto the common axis + adaptive
    baseline removal; emits the float32 spectrum and its TIC.

    The TIC is the float32 row sum (reference ``pipeline/outlier.py:42``
    sums the float32 matrix) — computed in numpy, not JVM, to stay
    bit-identical with the oracle.
    """
    spark = df.sparkSession
    axes_bc = spark.sparkContext.broadcast(
        {s: np.asarray(a, dtype=float) for s, a in source_axes.items()})
    new_axis_bc = spark.sparkContext.broadcast(np.asarray(new_axis, dtype=float))
    bw, bmin, binc = (config.baseline_max_width, config.baseline_min_width,
                      config.baseline_increment)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        axes = axes_bc.value
        new_ax = new_axis_bc.value
        width = new_ax.size
        for b in batches:
            names = b.schema.names
            flat, offs = _list_col_np(b, "tokens")
            srcs = b.column(names.index("source")).to_pylist()
            n = b.num_rows
            out = np.empty((n, width), dtype=np.float32)
            tic = np.empty(n, dtype=np.float64)
            for i in range(n):
                src = srcs[i]
                ax = axes.get(src)
                if ax is None:
                    raise ValueError(f"no m/z axis artifact for source "
                                     f"{src!r}")
                toks = flat[offs[i]:offs[i + 1]].astype(float)
                if toks.size != ax.size:
                    raise ValueError(
                        f"row token length {toks.size} != source axis length "
                        f"{ax.size} for source {src!r}")
                x = axis_k.resample_row(new_ax, ax, toks)
                x = baseline_k.remove_baseline(new_ax, x, bw, bmin, binc)
                out[i] = x
                tic[i] = float(x.sum())
            yield pa.RecordBatch.from_arrays(
                [b.column(names.index("doc_id")),
                 b.column(names.index("source")),
                 b.column(names.index("ts")),
                 _uniform_list_array(out), pa.array(tic)],
                names=["doc_id", "source", "ts", "spectrum", "tic"])

    return df.mapInArrow(
        run, schema="doc_id string, source string, ts long, "
                    "spectrum array<float>, tic double")


def tic_outlier_thresholds(df: DataFrame, tic_col: str = "tic",
                           seed: int = 0) -> outlier_k.TicThresholds:
    """Distributed two-phase outlier thresholding (SURVEY.md §2 A9).

    Phase 1 is three distributed exact-quantile/extrema passes over scalar
    columns (never the spectra); phase 2 is the seeded driver Monte Carlo.
    """
    n = df.count()
    if n < outlier_k.MIN_POPULATION:
        return outlier_k.TicThresholds(b1=float("-inf"), b2=float("inf"))
    if n <= COLLECT_THRESHOLD:
        # the TIC column is one scalar per row — below the driver-safe bound,
        # one collect replaces ~6 quantile/extrema jobs and runs the exact
        # numpy phase-1 directly (identical arithmetic to the distributed
        # path by construction)
        tics = (df.select(tic_col).toPandas()[tic_col]
                .to_numpy(dtype=float))
        from ..kernels.stats import median_and_iqr
        if median_and_iqr(tics)[1] == 0.0:
            return outlier_k.TicThresholds(b1=float("-inf"), b2=float("inf"))
        return outlier_k.thresholds_from_stats(
            outlier_k.tic_stats_numpy(tics), seed=seed)
    q25, q50, q75 = matlab_quantiles(df, tic_col, [0.25, 0.5, 0.75])
    tic_iqr = q75 - q25
    if tic_iqr == 0.0:
        return outlier_k.TicThresholds(b1=float("-inf"), b2=float("inf"))
    mn, mx = df.agg(F.min(tic_col), F.max(tic_col)).first()
    min_norm = (float(mn) - q50) / tic_iqr
    max_norm = (float(mx) - q50) / tic_iqr
    min_r = 0.1
    max_r = (max_norm - min_norm) + 0.1

    med_b, iqr_b, minn_b = float(q50), float(tic_iqr), float(min_norm)

    max_r_b = float(max_r)

    @F.pandas_udf("double")
    def w_col(t: pd.Series) -> pd.Series:
        w = outlier_k.w_transform(t.to_numpy(dtype=float), med_b, iqr_b,
                                  minn_b, 0.1, max_r_b)
        return pd.Series(np.asarray(w, dtype=float))

    with_w = df.select(F.col(tic_col)).withColumn("w", w_col(F.col(tic_col)))
    wq = matlab_quantiles(with_w, "w", [0.1, 0.25, 0.5, 0.75, 0.9])
    stats = outlier_k.TicStats(
        tic_median=float(q50), tic_iqr=float(tic_iqr),
        min_normalized=float(min_norm), min_r=min_r, max_r=float(max_r),
        w_q10=float(wq[0]), w_q25=float(wq[1]), w_median=float(wq[2]),
        w_q75=float(wq[3]), w_q90=float(wq[4]), n=int(n))
    return outlier_k.thresholds_from_stats(stats, seed=seed)


def with_inlier_mask(df: DataFrame, thr: outlier_k.TicThresholds,
                     tic_col: str = "tic") -> DataFrame:
    """Inlier predicate as a JVM column (reference keeps rows with
    ``not (tic <= B1 or tic >= B2)``)."""
    return df.withColumn(
        "is_inlier",
        ~((F.col(tic_col) <= F.lit(thr.b1)) | (F.col(tic_col) >= F.lit(thr.b2))))


def masked_mean_reference(df: DataFrame, vec_col: str,
                          mask_col: str = "is_inlier",
                          scale_to_tic: float | None = None) -> np.ndarray:
    """Reference-spectrum aggregation (``pipeline/_base.py:77-90``):
    per-source inlier mean, count-weighted average across sources.

    Scalable shape: per-partition float64 partial sums (tiny: one vector per
    (partition × source)) → driver combine. No applyInPandas group
    materialization, no skew sensitivity.

    ``scale_to_tic`` fuses the TIC-normalize stage into this pass: each
    float32 row is rescaled by ``tic / float32_row_sum`` before float64
    accumulation — bitwise-identical values to materializing
    :func:`tic_normalize_stage` first (float32 scaling, float64 widening),
    without shipping the normalized vectors through another Arrow round
    trip.
    """

    def _scaled64(mat32: np.ndarray) -> np.ndarray:
        """float32 per-row TIC rescale then float64 widen — the exact
        arithmetic of tic_normalize_stage (float32 row sum, float64 scalar
        divide, float32 multiply)."""
        factors = np.asarray(
            [scale_to_tic / float(r.sum()) for r in mat32], dtype=np.float64)
        return (mat32 * factors[:, None].astype(np.float32)) \
            .astype(np.float64)

    def partials(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[str, tuple[np.ndarray, int]] = {}
        for b in batches:
            names = b.schema.names
            flat, offs = _list_col_np(b, vec_col)
            mask = b.column(names.index(mask_col)) \
                .to_numpy(zero_copy_only=False).astype(bool)
            srcs = np.asarray(
                b.column(names.index("source")).to_pylist(), dtype=object)
            n = b.num_rows
            if n == 0:
                continue
            width = offs[1] - offs[0]
            assert offs[-1] - offs[0] == n * width, "ragged vector column"
            mat = flat[offs[0]:offs[-1]].reshape(n, width)
            for src in sorted(set(srcs[mask])):
                sub = mat[mask & (srcs == src)]
                if scale_to_tic is not None:
                    sub = _scaled64(np.ascontiguousarray(sub,
                                                         dtype=np.float32))
                else:
                    sub = sub.astype(np.float64)
                s, c = acc.get(src, (0.0, 0))
                acc[src] = (s + sub.sum(axis=0), c + len(sub))
        if acc:
            keys = list(acc)
            mat = np.stack([acc[k][0] for k in keys])
            yield pa.RecordBatch.from_arrays(
                [pa.array(keys, type=pa.string()),
                 _uniform_list_array(mat),
                 pa.array(np.array([acc[k][1] for k in keys],
                                   dtype=np.int64))],
                names=["source", "vec_sum", "n"])

    rows = (df.select("source", vec_col, mask_col)
            .mapInArrow(partials,
                        schema="source string, vec_sum array<double>, n long")
            .collect())
    # total deterministic order: collect() returns partials in task-completion
    # order, and float64 addition is not associative — sort by content so
    # repeated runs produce bit-identical references
    def _key(r):
        return (r["source"], r["n"], bytes(np.asarray(r["vec_sum"])))

    by_src: dict[str, tuple[np.ndarray, int]] = {}
    for r in sorted(rows, key=_key):
        s, c = by_src.get(r["source"], (0.0, 0))
        by_src[r["source"]] = (s + np.asarray(r["vec_sum"]), c + r["n"])
    refs = [v[0] / v[1] for _, v in sorted(by_src.items())]
    counts = [v[1] for _, v in sorted(by_src.items())]
    return np.average(np.asarray(refs), axis=0, weights=np.asarray(counts))


def masked_weighted_mean_scalar(df: DataFrame, col: str,
                                mask_col: str = "is_inlier") -> float:
    """Count-weighted mean across sources of the per-source inlier mean of a
    SCALAR column — the scalar analog of :func:`masked_mean_reference`
    (used for the TIC reference: ``Σ_channels mean_vector`` ==
    ``mean of row sums``). Pure JVM aggregation: per-(partition, source)
    partial sums, content-sorted driver combine for bit-determinism."""
    parts = (df.where(F.col(mask_col))
             .groupBy(F.spark_partition_id().alias("pid"), F.col("source"))
             .agg(F.sum(col).alias("s"), F.count("*").alias("n"))
             .collect())
    by_src: dict[str, tuple[float, int]] = {}
    for r in sorted(parts, key=lambda r: (r["source"], r["n"], r["s"])):
        s, c = by_src.get(r["source"], (0.0, 0))
        by_src[r["source"]] = (s + r["s"], c + r["n"])
    means = [v[0] / v[1] for _, v in sorted(by_src.items())]
    counts = [v[1] for _, v in sorted(by_src.items())]
    return float(np.average(np.asarray(means),
                            weights=np.asarray(counts, dtype=float)))


def pafft_stage(df: DataFrame, reference: np.ndarray, mz_axis: np.ndarray,
                config: PipelineConfig,
                vec_col: str = "spectrum",
                with_sum: bool = False) -> DataFrame:
    """Stage 5: PaFFT alignment against the broadcast reference.

    ``with_sum`` also emits ``aligned_sum`` (float64 row sum of the aligned
    float32 row) so downstream scalar reductions (the TIC reference) can run
    as JVM aggregations instead of another full-vector Arrow pass."""
    spark = df.sparkSession
    ref_bc = spark.sparkContext.broadcast(np.asarray(reference, dtype=float))
    ax_bc = spark.sparkContext.broadcast(np.asarray(mz_axis, dtype=float))
    seg, lim = config.pafft_minimum_segment, config.pafft_shift_limit
    passthrough = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != vec_col] + ["aligned array<float>"]
        + (["aligned_sum double"] if with_sum else []))

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ref, ax = ref_bc.value, ax_bc.value
        width = ax.size
        for b in batches:
            names = b.schema.names
            flat, offs = _list_col_np(b, vec_col)
            n = b.num_rows
            out = np.empty((n, width), dtype=np.float32)
            for i in range(n):
                out[i] = alignment.pafft(flat[offs[i]:offs[i + 1]], ref, ax,
                                         seg, lim)
            cols = [b.column(names.index(c)) for c in passthrough]
            cols.append(_uniform_list_array(out))
            out_names = list(passthrough) + ["aligned"]
            if with_sum:
                cols.append(pa.array(out.sum(axis=1, dtype=np.float64)))
                out_names.append("aligned_sum")
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    return df.mapInArrow(run, schema=schema)


def tic_normalize_stage(df: DataFrame, reference_tic: float,
                        vec_col: str = "aligned") -> DataFrame:
    """Stage 6: rescale each row to the reference TIC. The row TIC is the
    float32 sum of the aligned row (oracle parity), hence numpy-side."""
    passthrough = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != vec_col] + ["normalized array<double>"])
    ref_tic = float(reference_tic)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            normed = [
                np.asarray(v, dtype=np.float32)
                * (ref_tic / float(np.asarray(v, dtype=np.float32).sum()))
                for v in pdf[vec_col]
            ]
            out = pdf[passthrough].copy()
            out["normalized"] = normed
            yield out

    return df.mapInPandas(run, schema=schema)


def featurize_stage(df: DataFrame, artifacts: ArtifactSet,
                    vec_col: str = "normalized") -> DataFrame:
    """Stages 9+10 fused: banded GMM convolution + column merge, one batch
    matmul per Arrow batch (the hot kernel, reference
    ``components/convolve.py:14-27``)."""
    spark = df.sparkSession
    art_bc = spark.sparkContext.broadcast(artifacts)
    passthrough = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != vec_col] + ["features array<float>"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        art: ArtifactSet = art_bc.value
        bands = _bands_for(art)
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            feats = convolve_k.featurize_batch(mat, bands)
            merged = merge_k.apply_merging(feats, art.merge_starts,
                                           art.merge_lengths)
            out = pdf[passthrough].copy()
            out["features"] = list(merged)
            yield out

    return df.mapInPandas(run, schema=schema)


def smooth_stage(df: DataFrame, vec_col: str = "spectrum", window: int = 5,
                 order: int = 2, out_col: str = "smoothed") -> DataFrame:
    """Optional Savitzky–Golay smoothing stage (reference dead-code operator
    W3, ``components/spectrum/smoothing.py``)."""
    from ..kernels import smoothing as smoothing_k

    passthrough = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != vec_col] + [f"{out_col} array<double>"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[passthrough].copy()
            out[out_col] = [
                smoothing_k.savgol_smooth(np.asarray(v, dtype=float),
                                          window, order)
                for v in pdf[vec_col]
            ]
            yield out

    return df.mapInPandas(run, schema=schema)


def detect_peaks_stage(df: DataFrame, mz_axis: np.ndarray,
                       vec_col: str = "spectrum") -> DataFrame:
    """Optional gradient peak detection (reference dead-code operator W4,
    ``components/spectrum/peak.py``): per row → arrays of peak indices /
    m/z / intensities."""
    from ..kernels import smoothing as smoothing_k

    spark = df.sparkSession
    ax_bc = spark.sparkContext.broadcast(np.asarray(mz_axis, dtype=float))
    passthrough = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != vec_col]
        + ["peak_indices array<long>", "peak_mz array<double>",
           "peak_counts array<double>"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ax = ax_bc.value
        for pdf in batches:
            idxs, pmz, pct = [], [], []
            for v in pdf[vec_col]:
                i, m, c = smoothing_k.detect_peaks(ax,
                                                   np.asarray(v, dtype=float))
                idxs.append(i)
                pmz.append(m)
                pct.append(c)
            out = pdf[passthrough].copy()
            out["peak_indices"] = idxs
            out["peak_mz"] = pmz
            out["peak_counts"] = pct
            yield out

    return df.mapInPandas(run, schema=schema)


def export_csv(df: DataFrame, vec_col: str, path: str,
               fmt: str = "%.18e") -> None:
    """CSV matrix exporter (reference ``pipeline/export.py:10-34``): one line
    per row, values formatted with ``fmt``, comma-delimited. Distributed —
    each task formats its partition; output is a directory of CSV shards."""

    def fmt_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "value": [",".join(fmt % x for x in np.asarray(v))
                          for v in pdf[vec_col]]
            })

    (df.select(vec_col).mapInPandas(fmt_rows, schema="value string")
     .write.mode("overwrite").text(path))


def serve_features(df: DataFrame, artifact_versions: dict[int, ArtifactSet],
                   source_axes: dict[str, np.ndarray],
                   config: PipelineConfig,
                   version_col: str = "artifact_version") -> DataFrame:
    """THE hot path: fused serving UDF. Rows arrive already as-of-joined to an
    artifact version; one ``mapInPandas`` pass runs resample → baseline →
    PaFFT → TIC-normalize → convolve → merge per row against the broadcast
    artifact set of its version. Rows with no artifact version (ts before the
    first checkpoint) get null features — never a leaked artifact.
    """
    spark = df.sparkSession
    arts_bc = spark.sparkContext.broadcast(artifact_versions)
    axes_bc = spark.sparkContext.broadcast(
        {s: np.asarray(a, dtype=float) for s, a in source_axes.items()})
    bw, bmin, binc = (config.baseline_max_width, config.baseline_min_width,
                      config.baseline_increment)
    seg, lim = config.pafft_minimum_segment, config.pafft_shift_limit

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        arts = arts_bc.value
        axes = axes_bc.value
        for b in batches:
            names = b.schema.names
            flat, offs = _list_col_np(b, "tokens")
            srcs = b.column(names.index("source")).to_pylist()
            vers = b.column(names.index(version_col)).to_pylist()
            n = b.num_rows
            features: list = [None] * n
            by_ver: dict[int, list[int]] = {}
            for i, v in enumerate(vers):
                if v is not None:
                    by_ver.setdefault(int(v), []).append(i)
            for ver, idxs in by_ver.items():
                art = arts.get(ver)
                if art is None:
                    continue
                bands = _bands_for(art)
                rows = np.empty((len(idxs), art.mz_axis.size),
                                dtype=np.float32)
                for j, i in enumerate(idxs):
                    toks = flat[offs[i]:offs[i + 1]].astype(float)
                    ax = axes.get(srcs[i])
                    if ax is None:
                        raise ValueError(
                            f"no m/z axis artifact for source {srcs[i]!r}")
                    x = axis_k.resample_row(art.mz_axis, ax, toks)
                    x = baseline_k.remove_baseline(art.mz_axis, x, bw, bmin,
                                                   binc)
                    x = alignment.pafft(x, art.pafft_reference, art.mz_axis,
                                        seg, lim)
                    rows[j] = x * (art.tic_reference_tic / float(x.sum()))
                feats = convolve_k.featurize_batch(rows, bands)
                merged = merge_k.apply_merging(feats, art.merge_starts,
                                               art.merge_lengths)
                for i, vec in zip(idxs, merged):
                    features[i] = vec
            yield pa.RecordBatch.from_arrays(
                [b.column(names.index("doc_id")),
                 b.column(names.index("source")),
                 b.column(names.index("ts")),
                 b.column(names.index(version_col)).cast(pa.int64()),
                 pa.array(features, type=pa.list_(pa.float32()))],
                names=["doc_id", "source", "ts", version_col, "features"])

    return df.mapInArrow(
        run, schema=f"doc_id string, source string, ts long, "
                    f"{version_col} long, features array<float>")
