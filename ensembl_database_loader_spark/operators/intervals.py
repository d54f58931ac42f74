"""Binned interval-overlap join: pairs of intervals that overlap,
found with an EQUI-join on bin numbers instead of a theta-join.

The problem (the genomics classic — the reference's domain is Ensembl
genome databases, where "which features overlap this region" is THE
query; equally the time-interval overlap behind ad attribution and
session stitching): given left rows with [start, end] and right rows
with [start, end], emit every (left, right) pair whose intervals
overlap, optionally only within matching key columns (chromosome,
user_id).

A naive formulation is a range predicate join —
``l.start <= r.end AND r.start <= l.end`` — which Spark can only
execute as a broadcast nested-loop / cartesian when there is no equi
key, or as a sort-merge join that still compares every pair WITHIN a
key group when there is one. Both collapse at scale: a chromosome or a
hot user is millions of intervals, and million² comparisons is the end
of the job.

The bin trick makes the join an equi-join (the CHTS/UCSC binning
scheme reduced to one level, public knowledge from genome-browser
literature): pick a bin width ``w``, explode every interval into the
bins it touches (``sequence(floor(s/w), floor(e/w))``), and equi-join
on (keys..., bin). Overlapping intervals ALWAYS share the bin of the
later start — ``b* = floor(max(l.s, r.s) / w)`` is covered by both
sides whenever they overlap — so emitting a pair only in that one bin
(``bin == greatest(bin_of(l.s), bin_of(r.s))`` as a residual) yields
each pair EXACTLY once with no distinct/dedup shuffle. The overlap
test itself stays as a second residual.

Scale shape: shuffle keyed on (keys..., bin) — candidate pairs are
bounded per bin, and the per-row fan-out is span/w + 1, so ``w`` is
the knob: pick it near the median interval span (fan-out ~2) and
bins stay small while duplication stays constant. A giant interval
(a whole-chromosome annotation) fans out to many bins but each copy
is one tiny row; a hot BIN (a pileup region) is an AQE-splittable
skew key, not a cross-join. Everything is codegen DataFrame ops — no
UDF, no driver loop.

Oracle form (DuckDB): the plain theta join — tiny at test scale,
impossible at corpus scale; equality of the two is the probe gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(col: Column, width: int) -> Column:
    # FLOOR division (not DIV): negative coordinates must round toward
    # -inf so an interval crossing zero lands in contiguous bins
    return F.floor(col / F.lit(width)).cast("bigint")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: tuple[str, ...] = (),
    bin_width: int = 1000,
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs whose closed intervals overlap
    (``l.start <= r.end AND r.start <= l.end``), within matching
    ``by`` keys, via the binned equi-join above.

    Output columns: every left column as ``l_<name>``, every right
    column as ``r_<name>`` (prefixes configurable) — including the
    ``by`` keys from both sides, so downstream code never guesses
    which side a column came from. ``how='left'`` additionally emits
    unmatched left rows with null right columns (one anti-join).

    Start/end columns must be numeric (cast timestamps to epoch
    seconds first); rows with a null start or end have no interval
    and never match (SQL comparison semantics) — under ``how='left'``
    they surface as unmatched.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    for side, s, e in ((left, left_start, left_end), (right, right_start, right_end)):
        missing = [c for c in (s, e, *by) if c not in side.columns]
        if missing:
            raise ValueError(f"columns {missing!r} not in {side.columns}")
    if left_prefix == right_prefix:
        raise ValueError("left_prefix and right_prefix must differ")

    lcols = [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    ls, le = f"{left_prefix}{left_start}", f"{left_prefix}{left_end}"
    rs, re_ = f"{right_prefix}{right_start}", f"{right_prefix}{right_end}"

    # explode each side into the bins its interval touches; the bin
    # column is the equi key that keeps Catalyst on a hash join
    lb = (
        left.select(*lcols)
        .where(F.col(ls).isNotNull() & F.col(le).isNotNull())
        .withColumn(
            "__bin",
            F.explode(F.sequence(_bin_of(F.col(ls), bin_width), _bin_of(F.col(le), bin_width))),
        )
    )
    rb = (
        right.select(*rcols)
        .where(F.col(rs).isNotNull() & F.col(re_).isNotNull())
        .withColumn(
            "__bin",
            F.explode(F.sequence(_bin_of(F.col(rs), bin_width), _bin_of(F.col(re_), bin_width))),
        )
    )

    cond = lb["__bin"] == rb["__bin"]
    for k in by:
        cond = cond & (F.col(f"{left_prefix}{k}") == F.col(f"{right_prefix}{k}"))
    # overlap residual + emit-once residual (the first shared bin is
    # the later start's bin — provably covered by both sides iff the
    # intervals overlap, so no pair is double-counted across bins)
    cond = (
        cond
        & (F.col(ls) <= F.col(re_))
        & (F.col(rs) <= F.col(le))
        & (
            lb["__bin"]
            == F.greatest(_bin_of(F.col(ls), bin_width), _bin_of(F.col(rs), bin_width))
        )
    )
    pairs = lb.join(rb, cond, "inner").drop("__bin")

    if how == "inner":
        return pairs

    # left outer: unmatched left rows (including null-interval rows)
    # via one anti-join on the pair output's left identity columns —
    # NULL-SAFE equality, else a matched row with a null payload column
    # would also resurface as unmatched
    lkeyed = left.select(*lcols)
    matched = pairs.select(*[f"{left_prefix}{c}" for c in left.columns])
    anti_cond = None
    for c in left.columns:
        term = lkeyed[f"{left_prefix}{c}"].eqNullSafe(matched[f"{left_prefix}{c}"])
        anti_cond = term if anti_cond is None else anti_cond & term
    unmatched = lkeyed.join(matched, anti_cond, "left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(
            f"{right_prefix}{c}",
            F.lit(None).cast(dict(pairs.dtypes)[f"{right_prefix}{c}"]),
        )
    return pairs.unionByName(unmatched)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    by: tuple[str, ...] = (),
    bin_width: int = 1000,
    how: str = "inner",
) -> DataFrame:
    """Each point joined to every interval containing it — the
    degenerate (and most common) interval join: a point is a
    zero-length interval, so this is ``interval_join`` with the point
    as both start and end. Fan-out on the point side is exactly 1 bin
    per row regardless of ``bin_width``."""
    return interval_join(
        points,
        intervals,
        left_start=point,
        left_end=point,
        right_start=start,
        right_end=end,
        by=by,
        bin_width=bin_width,
        how=how,
    )
