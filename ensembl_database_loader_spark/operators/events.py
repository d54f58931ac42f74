"""Event-log analytics operators: sessionization and ordered
conversion funnels — the two event-table queries analysts otherwise
write as per-user self-joins of the log (quadratic per user, one
corpus shuffle per join).

Both operators are single-pass: one hash shuffle on the user column,
one per-user sort, chained window functions. At 100 TB the user column
is the natural partition key (billions of users, each with a bounded
event count), so no task ever sees more than one user's worth of
sorted data beyond its partition share — there is no global sort and
no self-join anywhere.

Timestamps are taken as BIGINT microseconds (``F.unix_micros(ts)``) so
gap/step arithmetic is exact integer math, identical across engines
(probes q58/q59 hash-gate against DuckDB's epoch_us on the same
parquet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_us: int,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    user was idle longer than ``gap_us``. Adds a per-user ``sess``
    number (1-based). The idle-gap lag and the session-start cumsum
    share ONE (ts, tiebreak) sort order — which also guarantees the
    session-start row is first in its tie group, so no row can land
    before its own session (sess=0 is impossible). Boundary decisions
    depend only on timestamp VALUES (tied rows have gap 0), so the
    result is deterministic under any tie order."""
    if "sess" in df.columns:
        raise ValueError(
            "sessionize writes a 'sess' column but the input already has "
            "one — rename or drop it first"
        )
    wo = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    is_new = F.when(
        (F.col(ts_col) - F.lag(ts_col).over(wo) > gap_us)
        | F.lag(ts_col).over(wo).isNull(),
        1,
    ).otherwise(0)
    return df.withColumn(
        "sess",
        F.sum(is_new).over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )


def conversion_funnel(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    tiebreak_col: str,
    steps: tuple[str, ...],
    step_within_us: int | None = None,
) -> DataFrame:
    """Ordered funnel (step i+1 strictly after step i, optionally
    within ``step_within_us``): one row per user with integer columns
    ``s1..sN`` (1 = user completed that step). Implemented as chained
    cumulative-min windows — 'earliest step-1 event so far', then
    'earliest qualifying step-2 event so far', ... — so the whole
    funnel is one shuffle + one sort however many steps it has,
    instead of ``N-1`` self-joins. Same-instant events don't advance
    the funnel (strict >); ties are deterministic."""
    if len(steps) < 1:
        # ValueError (not assert — stripped under python -O) for
        # consistency with the adjacent column-clash guard
        raise ValueError("steps must be non-empty")
    clash = [c for c in df.columns if c.startswith(("__cf_q", "__cf_f"))]
    if clash:
        raise ValueError(f"conversion_funnel internal columns clash: {clash}")
    wo = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    work = df
    prev_first: Column | None = None
    qual_cols: list[str] = []
    for i, step in enumerate(steps):
        if i == 0:
            qual = F.when(F.col(type_col) == step, F.col(ts_col))
        else:
            cond = (
                (F.col(type_col) == step)
                & prev_first.isNotNull()
                & (F.col(ts_col) > prev_first)
            )
            if step_within_us is not None:
                cond = cond & (F.col(ts_col) <= prev_first + step_within_us)
            qual = F.when(cond, F.col(ts_col))
        qc, fc = f"__cf_q{i}", f"__cf_f{i}"
        work = work.withColumn(qc, qual).withColumn(fc, F.min(qc).over(wo))
        qual_cols.append(qc)
        prev_first = F.col(fc)
    return work.groupBy(user_col).agg(
        *[
            F.max(F.when(F.col(qc).isNotNull(), 1).otherwise(0)).alias(f"s{i + 1}")
            for i, qc in enumerate(qual_cols)
        ]
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Cohort retention: users grouped by the period of their FIRST
    event; for each (cohort, offset) the distinct users from that
    cohort active ``offset`` periods later — the classic retention
    triangle. Returns ``(cohort bigint, offset bigint, n_users
    bigint)`` with period indexes as integer epoch multiples
    (``floor(unix_micros / period_us)``) so the arithmetic is exact
    integer math, identical across engines.

    Plan shape: the per-user first-event period comes from a window
    MIN over the same user-hash shuffle the log already needs — no
    self-join of the log with a firsts table — then one aggregate
    per (cohort, offset) with a partial-agg distinct. Two shuffles
    total at any scale; the naive formulation (log JOIN firsts) pays
    a third, log-sized shuffle.

    The one per-user sort this shares with sessionize/funnels makes
    the user column the natural clustering key for the event lake
    (compact_table(sort_cols=('user_id',)) upstream makes ALL of
    these operators near-shuffle-free)."""
    # DIV, not /+cast: genuinely BIGINT-exact (and floor semantics
    # matching the oracle's //) at any timestamp magnitude
    per = F.expr(f"unix_micros({ts_col}) DIV {int(period_us)}")
    withc = df.select(
        F.col(user_col).alias("_u"), per.alias("_p")
    ).withColumn("_cohort", F.min("_p").over(Window.partitionBy("_u")))
    return (
        withc.groupBy(
            F.col("_cohort").alias("cohort"),
            (F.col("_p") - F.col("_cohort")).alias("offset"),
        )
        .agg(F.count_distinct(F.col("_u")).cast("bigint").alias("n_users"))
    )


def rolling_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    trailing: int = 7,
    z_threshold: float = 3.0,
    ndigits: int = 4,
    densify: bool = True,
) -> DataFrame:
    """Volume-anomaly detection over the event log: per (key, day)
    counts z-scored against the TRAILING ``trailing``-day window (the
    day itself excluded — an anomaly must not suppress its own alarm by
    inflating the baseline). The monitor an ingest pipeline pages on
    when a source doubles or goes dark: complements the SHAPE monitors
    (PSI drift) with a VOLUME monitor.

    ``densify`` (default) fills the (key, day) grid so CALENDAR days
    with zero events appear as cnt=0 rows — without it a source that
    goes fully dark produces no row to alarm on, and the ROWS-based
    trailing window silently widens across calendar gaps. Each key's
    grid runs from its own first observed day to the GLOBAL last
    observed day (other sources still emitting prove the feed itself is
    alive), so a key dark at the tail of the log IS flagged. The fill
    is one lead() + sequence-explode over the already-aggregated daily
    frame — a single pass, no self-join, no second scan of the log.

    Output per (key, day): ``(key, day, cnt, base_mean, base_std, z,
    anomalous, n_base)`` — ``z`` null while the baseline window is
    shorter than 2 days or flat (std 0), ``anomalous`` true when
    ``|z| > z_threshold``. Day is the BIGINT epoch-day index and counts
    are BIGINT, so everything except the rounded mean/std/z is
    engine-exact.

    Scale shape: ONE partial-aggregated groupBy(key, day) collapses the
    100 TB log to (keys x days) rows; densification and the window
    functions then run on that tiny frame (per-key sort of day counts —
    thousands of rows, not events)."""
    if trailing < 2:
        raise ValueError(f"trailing must be >= 2, got {trailing}")
    day = (F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast("bigint")
    keys = [F.col(key_col).alias("key")] if key_col else [F.lit("all").alias("key")]
    daily = (
        df.select(*keys, day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    if densify:
        # each observed day emits itself plus the gap days before the
        # key's next observed day (or the global max day for the last
        # row) as cnt=0 — one window pass, the daily frame referenced
        # ONCE (no doubled upstream aggregate)
        wk = Window.partitionBy("key").orderBy("day")
        wg = Window.partitionBy()
        upper = F.coalesce(
            F.lead("day").over(wk) - F.lit(1), F.max("day").over(wg)
        )
        daily = (
            daily.withColumn("_to", upper)
            .select(
                "key",
                "cnt",
                F.posexplode(F.sequence(F.col("day"), F.col("_to"))).alias(
                    "_i", "_day"
                ),
            )
            .select(
                "key",
                F.col("_day").alias("day"),
                F.when(F.col("_i") == 0, F.col("cnt"))
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("cnt"),
            )
        )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-trailing, -1)
    )
    base_mean = F.avg("cnt").over(w)
    base_std = F.stddev_samp("cnt").over(w)
    n_base = F.count("cnt").over(w)
    z = (F.col("cnt") - base_mean) / base_std
    out = daily.select(
        "key",
        "day",
        "cnt",
        F.round(base_mean, ndigits).alias("base_mean"),
        F.round(base_std, ndigits).alias("base_std"),
        F.when(
            (n_base >= 2) & (base_std > 0), F.round(z, ndigits)
        ).alias("z"),
        n_base.cast("bigint").alias("n_base"),
    )
    return out.withColumn(
        "anomalous",
        F.coalesce(F.abs(F.col("z")) > F.lit(float(z_threshold)), F.lit(False)),
    )
