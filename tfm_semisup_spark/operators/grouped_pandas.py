"""Grouped Arrow-batched custom aggregation via ``applyInPandas``.

The pattern for per-key computations that genuinely need imperative
code (model fits per key, scipy calls, ...): one shuffle on the
grouping key, then each group processed as a pandas DataFrame inside
an Arrow batch. Here: per-user least-squares slope of event value over
time — chosen because SQL has an independent closed form
(``regr_slope``), so the Python path is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


SLOPE_SCHEMA = "user_id long, n long, slope double"


def per_user_value_trend(events: DataFrame) -> DataFrame:
    """(user_id, n, slope) where slope = OLS slope of value ~ epoch-hours.

    Equivalent SQL: ``regr_slope(value, epoch_us(ts)/3.6e9)`` per user.
    """

    _EPOCH_2024_NS = 1_704_067_200 * 10**9

    def fit(pdf):
        import numpy as np
        import pandas as pd

        # hours since 2024-01-01: centering near the data keeps the
        # normal-equation arithmetic well-conditioned (raw epoch-hours
        # ~4.7e5 would lose ~4 digits to cancellation in E[x^2]-E[x]^2,
        # which is how SQL regr_slope computes it)
        x = (pdf["ts"].astype("int64").to_numpy() - _EPOCH_2024_NS) / 3.6e12
        y = pdf["value"].to_numpy()
        n = len(pdf)
        if n < 2 or np.allclose(x, x[0]):
            slope = float("nan")
        else:
            slope = float(np.polyfit(x, y, 1)[0])
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n], "slope": [slope]}
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fit, schema=SLOPE_SCHEMA)
    )
