"""Pandas UDAFs (GROUPED_AGG pandas_udf).

NOTE: deliberately NO ``from __future__ import annotations`` here —
Spark's pandas_udf infers the UDAF kind from *evaluated* type hints, and
postponed (string) annotations make it fail with UNSUPPORTED_SIGNATURE.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf

__all__ = ["np_median"]


@pandas_udf("double")
def np_median(v: pd.Series) -> float:
    """Exact per-group median via NumPy (selection-based → deterministic
    across engines, unlike float-sum reductions)."""
    return float(np.median(v.to_numpy(dtype=np.float64)))
