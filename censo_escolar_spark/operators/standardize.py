"""Per-group standardization via the grouped-map Pandas API.

``applyInPandas`` (grouped map) is the right tool when a whole group
must be in one pandas frame at once — standardization, per-group model
fits, rank transforms. Completes the engine's vectorized-Python surface
alongside ``pandas_udf`` (scalar), ``mapInPandas`` (stream of batches)
and ``applyInPandasWithState`` (streaming state).

Cross-engine float discipline (the t13/t14 rule): moments come from
INTEGER sums (exact in int64 and in DuckDB's hugeint), converted to
float by single divisions whose expression shape the oracle mirrors
operator-for-operator — so z-scores are bit-identical to SQL.

Scale shape: one shuffle on the group key; each group must fit in one
task's memory (the applyInPandas contract — use a closed-form
window/aggregate formulation instead when groups can be huge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    out_col: str = "z",
) -> DataFrame:
    """Population z-score of an INTEGER column within each group.

    z = (x - mean) / std with mean = s/n, std = sqrt(ss/n - mean²) from
    integer sums s, ss; constant groups (std == 0, or NaN from a
    rounding-negative variance) get z = 0.0. Output schema = input
    schema + ``out_col`` double.
    """
    out_schema = df.schema.simpleString()[7:-1] + f",{out_col}:double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype="int64")
        n = len(x)
        s = int(x.sum())
        ss = int((x * x).sum())
        mean = s / n
        std = np.sqrt((ss / n) - mean * mean)  # NaN if rounding-negative
        z = (x.astype("float64") - mean) / std if std > 0 else np.zeros(n)
        return pdf.assign(**{out_col: z})

    return df.groupBy(*group_cols).applyInPandas(
        standardize, schema=out_schema.replace(":", " ")
    )
