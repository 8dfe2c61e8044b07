"""Operator modules. Import submodules directly (e.g.
``from datacurator_jl_spark.operators.buildcomp import buildcomp``) —
the package deliberately does not re-export functions, because a
re-exported name would shadow its submodule of the same name.
"""

from datacurator_jl_spark.operators import (  # noqa: F401
    buildcomp,
    dataframe_ops,
    dedup,
    mode_filter,
    similarity,
    skew,
)

__all__ = [
    "buildcomp",
    "dataframe_ops",
    "dedup",
    "mode_filter",
    "similarity",
    "skew",
]
