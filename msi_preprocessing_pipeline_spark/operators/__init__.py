"""DataFrame-level operator library.

* :mod:`asof`       — as-of joins (union+window and sort-merge variants,
  skew salting), backfill.
* :mod:`windows`    — lag/lead/sessionize over (entity, ts).
* :mod:`quantiles`  — distributed EXACT quantiles (sort + rank + linear
  interpolation; never ``percentile_approx`` on the compat path).
* :mod:`spectrum`   — the staged spectrum feature operators (vectorized
  Arrow UDFs over broadcast artifacts).
* :mod:`dedup`      — exact/MinHash-LSH/SimHash/n-gram-Jaccard dedup.
* :mod:`similarity` — brute-force + LSH-bucketed cosine top-k.
* :mod:`text`       — language-ID, quality scoring, token counts,
  fingerprints.
* :mod:`multimodal` — binary-payload plumbing (decode steps stubbed).
"""
