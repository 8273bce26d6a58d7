"""Ordered funnel analysis: how far each user progresses through a
required event sequence (signup → view → click → purchase …).

The classic warehouse formulation chains K self-joins (min ts of step k
strictly after step k-1) — K shuffles of the event table. This operator
computes the same answer in ONE shuffle: per user, sort the (ts, type)
pairs array-side and run a single ``F.aggregate`` fold whose state is
(steps_completed, ts_of_last_step) — a Catalyst lambda, no Python, no
window. Per-user state is bounded by that user's event count (the usual
per-entity sessionization caveat: a pathological single-user firehose
needs pre-bucketing, same as sessionize).

Equivalence to the join form (which the oracle runs): the fold advances
on the FIRST event matching the current step with ts strictly greater
than the previous step's — exactly min(ts > prev) per step, since
events are processed in (ts, type) order.

Reference parity: no reference counterpart — analytics extension in the
family of sessionize/trailing_window_sum (workload.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """(user, steps_completed, t_first, t_converted) — funnel progress
    per user. ``t_first`` is the first step-1 event (null if never),
    ``t_converted`` the completion time of the FULL funnel (null
    otherwise)."""
    step_arr = F.array(*[F.lit(s) for s in steps])
    n_steps = len(steps)

    def advance(acc, e):
        cond = (
            (acc["step"] < n_steps)
            & (e["t"] == F.element_at(step_arr, acc["step"] + 1))
            & ((acc["step"] == 0) | (e["ts"] > acc["last"]))
        )
        return F.when(
            cond,
            F.struct(
                (acc["step"] + 1).alias("step"), e["ts"].alias("last")
            ),
        ).otherwise(acc)

    per_user = df.groupBy(F.col(user_col).alias("user")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t"))
            )
        ).alias("evs"),
        F.min(
            F.when(F.col(type_col) == steps[0], F.col(ts_col))
        ).alias("t_first"),
    )
    init = F.struct(
        F.lit(0).alias("step"), F.lit(None).cast("timestamp").alias("last")
    )
    folded = per_user.select(
        "user",
        "t_first",
        F.aggregate(F.col("evs"), init, advance).alias("_st"),
    )
    return folded.select(
        "user",
        F.col("_st.step").cast("long").alias("steps_completed"),
        "t_first",
        F.when(F.col("_st.step") == n_steps, F.col("_st.last")).alias(
            "t_converted"
        ),
    )
