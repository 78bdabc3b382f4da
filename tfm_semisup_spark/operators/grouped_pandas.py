"""Grouped Arrow-batched custom aggregation.

Two forms of the same per-user OLS slope (chosen because SQL has an
independent closed form, ``regr_slope``, so the Python path is
oracle-checkable):

- ``per_user_value_trend_apply``: the canonical ``applyInPandas``
  pattern — one shuffle on the key, the UDF sees one pandas DataFrame
  per group. Spark ships ONE ARROW BATCH PER GROUP, so with many small
  groups the IPC round-trips dominate (measured 3.3s vs 0.25s for the
  equivalent JVM agg on 1500 groups / 100k rows at sf0.1).
- ``per_user_value_trend`` (default): the many-small-groups scale
  pattern — repartition by key + ``sortWithinPartitions`` makes each
  group contiguous inside ordinary ~10k-row ``mapInPandas`` batches; a
  vectorized pandas groupby computes ALL groups in a batch at once,
  with carry-over stitching for the group that straddles a batch
  boundary. Python calls drop from O(groups) to O(batches).

Both return identical results (tests/test_extension_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SLOPE_SCHEMA = "user_id long, n long, slope double"

_EPOCH_2024_NS = 1_704_067_200 * 10**9


def _slopes_of(pdf):
    """Vectorized per-user OLS slope over a pandas frame holding one or
    more COMPLETE user groups. slope = cov(x,y)/var(x) via group sums;
    x is hours since 2024-01-01 (centering near the data keeps the
    sum-of-products arithmetic well-conditioned)."""
    import numpy as np
    import pandas as pd

    x = (pdf["ts"].astype("int64") - _EPOCH_2024_NS) / 3.6e12
    y = pdf["value"].astype("float64")
    tmp = pd.DataFrame(
        {
            "user_id": pdf["user_id"].astype("int64"),
            "x": x,
            "y": y,
            "xx": x * x,
            "xy": x * y,
        }
    )
    g = tmp.groupby("user_id", sort=False)
    agg = g.agg(
        n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
        sxx=("xx", "sum"), sxy=("xy", "sum"),
    )
    denom = agg["sxx"] - agg["sx"] * agg["sx"] / agg["n"]
    numer = agg["sxy"] - agg["sx"] * agg["sy"] / agg["n"]
    slope = np.where((agg["n"] >= 2) & (denom > 0), numer / denom, np.nan)
    return pd.DataFrame(
        {"user_id": agg.index, "n": agg["n"].to_numpy(), "slope": slope}
    )


def per_user_value_trend(events: DataFrame) -> DataFrame:
    """(user_id, n, slope): mapInPandas over key-contiguous partitions —
    the many-small-groups scale path (see module docstring).

    Equivalent SQL: ``regr_slope(value, epoch_us(ts)/3.6e9)`` per user.
    """

    def fit_batches(batches):
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            # hold back the trailing (possibly incomplete) group
            last_uid = pdf["user_id"].iloc[-1]
            boundary = pdf["user_id"] == last_uid
            carry = pdf[boundary]
            head = pdf[~boundary]
            if len(head):
                yield _slopes_of(head)
        if carry is not None and len(carry):
            yield _slopes_of(carry)

    return (
        events.select("user_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id")
        .mapInPandas(fit_batches, schema=SLOPE_SCHEMA)
    )


def per_user_value_trend_apply(events: DataFrame) -> DataFrame:
    """(user_id, n, slope) via ``applyInPandas`` — the canonical grouped
    pattern; prefer ``per_user_value_trend`` when groups are many and
    small (one Arrow batch per group, see module docstring)."""

    def fit(pdf):
        import numpy as np
        import pandas as pd

        x = (pdf["ts"].astype("int64").to_numpy() - _EPOCH_2024_NS) / 3.6e12
        y = pdf["value"].to_numpy()
        n = len(pdf)
        if n < 2 or np.allclose(x, x[0]):
            slope = float("nan")
        else:
            # closed-form centered OLS: cov(x,y)/var(x) — same estimate
            # as polyfit's lstsq without a per-group Vandermonde+SVD
            dx = x - x.mean()
            slope = float((dx * (y - y.mean())).sum() / (dx * dx).sum())
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n], "slope": [slope]}
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fit, schema=SLOPE_SCHEMA)
    )
