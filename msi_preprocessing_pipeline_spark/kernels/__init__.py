"""Pure-numpy numerical kernels.

Every kernel here is used twice: inside vectorized pandas/Arrow UDFs on
executors, and directly by the pytest oracle. Keeping a single implementation
guarantees the Spark path and the oracle path run bit-identical arithmetic
(float32 cast points included), which is what the allclose parity contract
requires.

Numerical semantics follow the reference pipeline
(``gmrukwa/msi-preprocessing-pipeline``); each module's docstring cites the
reference file:line it reproduces. No code is copied — the reference defines
WHAT to compute, these modules are fresh implementations.
"""
