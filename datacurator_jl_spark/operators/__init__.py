from datacurator_jl_spark.operators.buildcomp import buildcomp
from datacurator_jl_spark.operators.dataframe_ops import (
    delete_rows,
    extract,
    extract_any,
    extract_columns,
    groupbycolumn,
)

__all__ = [
    "buildcomp",
    "extract",
    "extract_any",
    "delete_rows",
    "extract_columns",
    "groupbycolumn",
]
