"""Pure pandas/numpy kernels — no Spark imports.

These are the vectorized re-implementations of the reference's text and
geometry semantics. They are the single source of truth: both the golden
(pure-pandas) pipeline used to produce expected test outputs and the
Spark mapInPandas operators call these exact functions.
"""
