"""The staged feature pipeline over Spark.

``fit`` runs the reference's artifact-building stages (the Luigi DAG's
aggregate spine, SURVEY.md §3.1) as DataFrame jobs; ``transform`` is the hot
serving path: a point-in-time **as-of join** of rows against the versioned
artifact spine followed by ONE fused vectorized UDF pass
(``operators.spectrum.serve_features``).

Point-in-time mode (``fit_pit``) fits one artifact version per checkpoint
from the rows at-or-before it; the backward as-of join guarantees zero
temporal leakage (a row only ever sees an artifact version with
``valid_from_ts <= ts``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import axis as axis_k, gmm as gmm_k, merge as merge_k
from ..oracle import PipelineConfig, filter_components
from ..operators import spectrum as sp
from ..operators.asof import asof_join, asof_join_broadcast


class FeaturePipeline:
    def __init__(self, spark: SparkSession,
                 source_axes: dict[str, np.ndarray],
                 config: PipelineConfig | None = None,
                 target_partitions: int | None = None):
        self.spark = spark
        self.source_axes = {s: np.asarray(a, dtype=float)
                            for s, a in source_axes.items()}
        self.config = config or PipelineConfig()
        # S9 substitute (reference ``plot.py:6-21`` HTML histogram sink):
        # per-threshold decomposition of the last fit's component filters,
        # exposed as a queryable metrics table via threshold_diagnostics_df()
        self.last_fit_diagnostics: list[dict] = []
        # The UDF stages are CPU-bound (~3 ms/row — baseline + PaFFT), so
        # partitioning must track cores, not bytes: byte-based AQE coalescing
        # or a small parquet file would serialize the stage. 4× cores
        # measured best (wave balancing) while keeping tasks >100 ms.
        self.target_partitions = (
            target_partitions
            or 4 * spark.sparkContext.defaultParallelism)

    def _maybe_rebalance(self, df: DataFrame) -> DataFrame:
        """Round-robin repartition ONLY when the input is under-partitioned
        for the CPU-bound UDF stages; a well-split scan stays shuffle-free."""
        cores = self.spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < 2 * cores:
            return df.repartition(self.target_partitions)
        return df

    # ---------------------------------------------------------------- fit

    def common_axis(self) -> np.ndarray:
        """Stage 1 (driver-side: axes are tiny per-source artifacts)."""
        axes = self.source_axes
        lo = max(float(np.min(a)) for a in axes.values())
        hi = min(float(np.max(a)) for a in axes.values())
        n_ticks = min(int(np.sum((a >= lo) & (a <= hi)))
                      for a in axes.values())
        first = sorted(axes)[0]
        return axis_k.estimate_new_axis(axes[first], n_ticks,
                                        np.array([lo, hi]))

    def fit(self, df: DataFrame, version: int = 1,
            valid_from_ts: int | None = None,
            max_ts: int | None = None) -> sp.ArtifactSet:
        """Fit all artifacts from ``df`` (optionally truncated at ``max_ts``
        for point-in-time fitting). ``df`` must carry ``ts``."""
        cfg = self.config
        if max_ts is not None:
            df = df.where(F.col("ts") <= F.lit(int(max_ts)))
        mz_axis = self.common_axis()

        stage_a = sp.resample_baseline_stage(
            self._maybe_rebalance(df),
            self.source_axes, mz_axis, cfg).persist()
        try:
            thr = sp.tic_outlier_thresholds(stage_a, seed=cfg.outlier_seed)
            masked = sp.with_inlier_mask(stage_a, thr)
            pafft_ref = sp.masked_mean_reference(masked, "spectrum")

            # one pass fewer than the naive staging: pafft emits the float64
            # row sum so the TIC reference is a JVM scalar aggregation, and
            # the normalize stage is fused into the gmm-reference partials
            # (bitwise-identical values, no extra Arrow round trip)
            stage_b = sp.pafft_stage(masked, pafft_ref, mz_axis, cfg,
                                     with_sum=True).persist()
            try:
                ref_tic = sp.masked_weighted_mean_scalar(stage_b,
                                                         "aligned_sum")
                gmm_ref = sp.masked_mean_reference(stage_b, "aligned",
                                                   scale_to_tic=ref_tic)
            finally:
                stage_b.unpersist()
        finally:
            stage_a.unpersist()

        # driver-side model fitting on the single reference vector
        n_dense = (cfg.gmm_axis_points or
                   int(cfg.gmm_axis_factor * mz_axis.size))
        dense_axis = axis_k.estimate_new_axis(
            mz_axis, n_dense,
            np.array([float(np.min(mz_axis)), float(np.max(mz_axis))]))
        dense_ref = np.interp(dense_axis, mz_axis, gmm_ref)
        model = gmm_k.estimate_spectrum_gmm(
            dense_axis, dense_ref,
            max_components_per_segment=cfg.gmm_max_components_per_segment,
            rel_threshold=cfg.gmm_rel_threshold)
        diags: list[dict] = []
        keep = filter_components(model, cfg, diagnostics=diags)
        self.last_fit_diagnostics = diags
        mu, sig, w = model.mu[keep], model.sig[keep], model.w[keep]
        merged = merge_k.merge_components(mu, sig, w)

        return sp.ArtifactSet(
            version=version,
            valid_from_ts=int(valid_from_ts if valid_from_ts is not None
                              else cfg.epoch_base),
            mz_axis=mz_axis, b1=thr.b1, b2=thr.b2,
            pafft_reference=np.asarray(pafft_ref),
            tic_reference_tic=ref_tic,
            gmm_mu=mu, gmm_sig=sig, gmm_w=w,
            merge_starts=merged.starts, merge_lengths=merged.lengths)

    # checkpoint DAG order of fit_checkpointed — targeted recompute
    # (CLI ``recompute --stage X``) invalidates X and everything after it
    CHECKPOINT_ORDER = (
        "mz_axis", "resample_baseline", "tic_thresholds", "pafft_reference",
        "pafft", "tic_reference_tic", "normalized", "gmm_reference",
        "artifact_set")

    def fit_checkpointed(self, df: DataFrame, runner, version: int = 1,
                         valid_from_ts: int | None = None,
                         max_ts: int | None = None) -> sp.ArtifactSet:
        """Checkpoint-resumable fit: every stage materializes through the
        :class:`..plans.runner.StageRunner`; a rerun (after a crash or kill)
        skips committed stages and produces byte-identical artifacts (the
        Luigi target-existence-skip analog, FIXTURES.md F5)."""
        cfg = self.config
        if max_ts is not None:
            df = df.where(F.col("ts") <= F.lit(int(max_ts)))
        mz_axis = np.asarray(runner.run_artifact(
            "mz_axis", lambda: self.common_axis().tolist()))

        stage_a = runner.run_stage(
            "resample_baseline",
            lambda: sp.resample_baseline_stage(
                self._maybe_rebalance(df), self.source_axes,
                mz_axis, cfg))
        thr_vals = runner.run_artifact(
            "tic_thresholds",
            lambda: list(sp.tic_outlier_thresholds(stage_a,
                                                   seed=cfg.outlier_seed)))
        from ..kernels.outlier import TicThresholds
        thr = TicThresholds(*thr_vals)
        masked = sp.with_inlier_mask(stage_a, thr)
        pafft_ref = np.asarray(runner.run_artifact(
            "pafft_reference",
            lambda: sp.masked_mean_reference(masked, "spectrum").tolist()))

        # same fused staging as fit(): the TIC reference is a JVM scalar
        # aggregation over per-row float64 sums, so fit() and
        # fit_checkpointed() yield IDENTICAL artifacts for the same input.
        # (Relative to the oracle's np.sum over the mean vector this is a
        # reordered-sum equivalence — allclose, not bitwise; only the
        # TIC-normalize fusion itself is bitwise-identical.)
        stage_b = runner.run_stage(
            "pafft", lambda: sp.pafft_stage(masked, pafft_ref, mz_axis, cfg,
                                            with_sum=True))
        ref_tic = float(runner.run_artifact(
            "tic_reference_tic",
            lambda: sp.masked_weighted_mean_scalar(stage_b, "aligned_sum")))

        stage_c = runner.run_stage(
            "normalized", lambda: sp.tic_normalize_stage(stage_b, ref_tic))
        gmm_ref = np.asarray(runner.run_artifact(
            "gmm_reference",
            lambda: sp.masked_mean_reference(stage_c, "normalized").tolist()))

        def build_model() -> dict:
            n_dense = (cfg.gmm_axis_points or
                   int(cfg.gmm_axis_factor * mz_axis.size))
            dense_axis = axis_k.estimate_new_axis(
                mz_axis, n_dense,
                np.array([float(np.min(mz_axis)), float(np.max(mz_axis))]))
            dense_ref = np.interp(dense_axis, mz_axis, gmm_ref)
            model = gmm_k.estimate_spectrum_gmm(
                dense_axis, dense_ref,
                max_components_per_segment=cfg.gmm_max_components_per_segment,
                rel_threshold=cfg.gmm_rel_threshold)
            keep = filter_components(model, cfg)
            mu, sig, w = model.mu[keep], model.sig[keep], model.w[keep]
            merged = merge_k.merge_components(mu, sig, w)
            return sp.ArtifactSet(
                version=version,
                valid_from_ts=int(valid_from_ts if valid_from_ts is not None
                                  else cfg.epoch_base),
                mz_axis=mz_axis, b1=thr.b1, b2=thr.b2,
                pafft_reference=pafft_ref, tic_reference_tic=ref_tic,
                gmm_mu=mu, gmm_sig=sig, gmm_w=w,
                merge_starts=merged.starts,
                merge_lengths=merged.lengths).to_row()

        return sp.ArtifactSet.from_row(
            runner.run_artifact("artifact_set", build_model))

    def fit_pit(self, df: DataFrame, checkpoint_ts: list[int]) \
            -> list[sp.ArtifactSet]:
        """One artifact version per checkpoint, each fitted ONLY from rows
        with ``ts <= checkpoint`` (zero-leakage training passes)."""
        return [
            self.fit(df, version=k + 1, valid_from_ts=ts_k, max_ts=ts_k)
            for k, ts_k in enumerate(sorted(checkpoint_ts))
        ]

    def threshold_diagnostics_df(self) -> DataFrame:
        """The last fit's filter-threshold decomposition (amplitude +
        variance stages) as a small DataFrame — the reference exposes the
        same quantities only as HTML histogram plots."""
        from ..oracle import THRESHOLD_DIAGNOSTICS_SCHEMA
        return self.spark.createDataFrame(
            self.last_fit_diagnostics or [],
            schema=THRESHOLD_DIAGNOSTICS_SCHEMA)

    # ---------------------------------------------------------- transform

    def artifact_spine(self, artifacts: list[sp.ArtifactSet]) -> DataFrame:
        """Entity-keyed artifact timeline for the as-of join: one row per
        (source, version). Tiny — broadcast side of the join."""
        rows = [
            {"source": s, "valid_from_ts": a.valid_from_ts,
             "artifact_version": a.version}
            for a in artifacts for s in sorted(self.source_axes)
        ]
        return self.spark.createDataFrame(
            rows, schema="source string, valid_from_ts long, "
                         "artifact_version long")

    def transform(self, df: DataFrame, artifacts: list[sp.ArtifactSet],
                  salt_buckets: int | None = None,
                  asof_strategy: str = "broadcast",
                  rebalance: bool | str = "auto") -> DataFrame:
        """Serving: as-of join rows to their artifact version, then the fused
        featurization UDF. Rows before the first version yield null features.

        ``asof_strategy='broadcast'`` (default): the artifact spine is a tiny
        per-entity timeline → broadcast join + array pick, ZERO shuffle on the
        row side and inherently skew-immune. ``'window'``: the general
        union+window sort-merge as-of (use when the right side is large);
        ``salt_buckets`` applies to that path.

        ``rebalance``: the serve UDF is CPU-bound per row, so parallelism
        must track cores. ``'auto'`` (default) keeps the plan SHUFFLE-FREE
        when the scan already yields enough splits (small
        ``maxPartitionBytes`` — see ``session.py``) and falls back to a
        round-robin repartition only when the input is under-partitioned
        (e.g. one fat file). ``True``/``False`` force either path.
        """
        spine = self.artifact_spine(artifacts)
        if asof_strategy == "broadcast":
            joined = asof_join_broadcast(df, spine, on="source",
                                         left_ts="ts",
                                         right_ts="valid_from_ts",
                                         value_cols=["artifact_version"])
        else:
            joined = asof_join(df, spine, on="source", left_ts="ts",
                               right_ts="valid_from_ts",
                               value_cols=["artifact_version"],
                               direction="backward",
                               salt_buckets=salt_buckets)
        versions = {a.version: a for a in artifacts}
        if rebalance == "auto":
            cores = self.spark.sparkContext.defaultParallelism
            rebalance = df.rdd.getNumPartitions() < 2 * cores
        if rebalance:
            joined = joined.repartition(self.target_partitions)
        return sp.serve_features(joined, versions, self.source_axes,
                                 self.config)

    def fit_transform(self, df: DataFrame,
                      salt_buckets: int | None = None) -> DataFrame:
        """The reference's batch semantics: fit on everything, apply to
        everything (single artifact version)."""
        art = self.fit(df)
        return self.transform(df, [art], salt_buckets=salt_buckets)
