"""Pure-NumPy estimator kernels.

These run inside Arrow-batched pandas UDFs on Spark executors (and stand
alone in tests).  No scipy/sklearn/statsmodels/numba dependencies — every
estimator is implemented from scratch against the reference semantics
documented in SURVEY.md §2.
"""
