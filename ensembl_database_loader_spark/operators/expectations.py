"""Declarative data-quality expectations: a rule suite evaluated
against a table, returning one verdict row per rule — the pre-commit
gate a 100 TB ingest pipeline runs before publishing a batch
(Deequ / dbt-test analogue; reference parallel: the coverage assert
that refuses to finish a mirror run with unloaded databases,
``DatabaseFactory.pm:110-121`` — here generalized from "every db
loaded" to arbitrary row- and table-level contracts).

Scale shape — the part that matters at 100 TB:

* ALL column-level rules (not_null / in_range / accepted_values /
  regex / mean / row_count) compile to conditional-count expressions
  evaluated in ONE partial-aggregated pass over the table — a suite of
  40 rules costs the same single scan as one rule, and nothing
  shuffles more than the one-row aggregate state.
* ``unique`` rules add exact ``count(distinct struct(...))``
  aggregates to the SAME pass. Spark plans k distinct aggregates as an
  Expand (k+1 input replicas) — fine for a handful of key-uniqueness
  rules; with ``approx=True`` they switch to approx_count_distinct
  (HLL++, no Expand) and the verdict tolerates the sketch's ~2% error
  band (a surplus below the band cannot be distinguished from exact,
  so ``passed`` may be optimistic — documented, and why exact is the
  default).
* ``referential`` rules are the genuinely relational checks: each is
  one LEFT ANTI join against the referenced key set (null FKs are not
  violations — SQL FK semantics). The referenced side is usually a
  dimension; Spark's AQE broadcasts it when small. These cannot ride
  the single pass and are costed per rule.

The report is LONG format (one row per rule), totally ordered by rule
name, every count BIGINT and every float rendered via round() — so it
hash-gates cleanly and downstream "fail the pipeline" logic is a plain
filter on ``passed``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative rule. ``kind`` picks the evaluator; ``params``
    are kind-specific. ``name`` must be unique within a suite (it is
    the report's sort key)."""

    name: str
    kind: str
    column: str | None = None
    params: dict = field(default_factory=dict)


def expect_not_null(column: str, name: str | None = None) -> Expectation:
    return Expectation(name or f"not_null:{column}", "not_null", column)


def expect_unique(*columns: str, name: str | None = None) -> Expectation:
    """Key uniqueness over non-null keys (rows where any key column is
    null are excluded, then surplus = kept_rows - distinct_keys)."""
    if not columns:
        raise ValueError("expect_unique: at least one column required")
    return Expectation(
        name or f"unique:{','.join(columns)}", "unique", columns[0],
        {"columns": tuple(columns)},
    )


def expect_in_range(column: str, lo, hi, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"in_range:{column}", "in_range", column, {"lo": lo, "hi": hi}
    )


def expect_values_in(column: str, values, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"values_in:{column}", "values_in", column,
        {"values": tuple(values)},
    )


def expect_regex(column: str, pattern: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"regex:{column}", "regex", column, {"pattern": pattern}
    )


def expect_row_count(lo: int, hi: int | None = None, name: str | None = None) -> Expectation:
    return Expectation(
        name or "row_count", "row_count", None, {"lo": lo, "hi": hi}
    )


def expect_mean_between(
    column: str, lo: float, hi: float, ndigits: int = 4, name: str | None = None
) -> Expectation:
    """Mean of non-null values within [lo, hi]; observed is rounded to
    ``ndigits`` so float summation-order noise cannot leak into the
    report hash."""
    return Expectation(
        name or f"mean:{column}", "mean", column,
        {"lo": lo, "hi": hi, "ndigits": ndigits},
    )


def expect_referential(
    column: str, ref: str, ref_column: str, name: str | None = None
) -> Expectation:
    """Every non-null ``column`` value exists in ``refs[ref]``'s
    ``ref_column`` (SQL FK semantics: null FKs never violate)."""
    return Expectation(
        name or f"fk:{column}->{ref}.{ref_column}", "referential", column,
        {"ref": ref, "ref_column": ref_column},
    )


_REPORT_COLS = ("rule", "kind", "column", "violations", "observed", "passed")


def _cnt_if(cond) -> F.Column:
    return F.count_if(cond).cast("bigint")


def run_expectations(
    df: DataFrame,
    expectations: list[Expectation] | tuple[Expectation, ...],
    refs: dict[str, DataFrame] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Evaluate a suite; return ``(rule, kind, column, violations,
    observed, passed)`` — one row per rule, ordered by rule name.

    ``violations`` is the number of offending rows (or surplus
    duplicates / out-of-band units for aggregate rules); ``observed``
    is the metric the rule inspected, rendered as a string; ``passed``
    is ``violations == 0`` for row rules and the band check for
    aggregate rules.
    """
    refs = refs or {}
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"run_expectations: duplicate rule name(s) {dupes!r}")
    for e in expectations:
        if e.kind == "unique":
            missing = [c for c in e.params["columns"] if c not in df.columns]
        else:
            missing = [e.column] if e.column and e.column not in df.columns else []
        if missing:
            raise ValueError(
                f"run_expectations: rule {e.name!r} references unknown "
                f"column(s) {missing!r}; frame has {list(df.columns)!r}"
            )
        if e.kind == "referential" and e.params["ref"] not in refs:
            raise ValueError(
                f"run_expectations: rule {e.name!r} references table "
                f"{e.params['ref']!r} not in refs {sorted(refs)!r}"
            )

    spark = df.sparkSession

    # ---- the single aggregate pass: every non-referential rule -------
    aggs: list[F.Column] = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for i, e in enumerate(expectations):
        a = f"__m{i}"
        c = F.col(e.column) if e.column else None
        if e.kind == "not_null":
            aggs.append(_cnt_if(c.isNull()).alias(a))
        elif e.kind == "unique":
            cols = [F.col(x) for x in e.params["columns"]]
            nn = reduce(lambda p, q: p & q, [x.isNotNull() for x in cols])
            aggs.append(_cnt_if(nn).alias(f"{a}_kept"))
            # null the key when ANY component is null so count_distinct
            # skips it (a struct with a null field is itself non-null)
            key = F.when(nn, F.struct(*cols) if len(cols) > 1 else cols[0])
            distinct = (
                F.approx_count_distinct(key) if approx else F.count_distinct(key)
            )
            aggs.append(distinct.cast("bigint").alias(f"{a}_distinct"))
        elif e.kind == "in_range":
            lo, hi = e.params["lo"], e.params["hi"]
            aggs.append(
                _cnt_if(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).alias(a)
            )
        elif e.kind == "values_in":
            aggs.append(
                _cnt_if(c.isNotNull() & ~c.isin(*e.params["values"])).alias(a)
            )
        elif e.kind == "regex":
            aggs.append(
                _cnt_if(c.isNotNull() & ~c.rlike(e.params["pattern"])).alias(a)
            )
        elif e.kind == "mean":
            aggs.append(
                F.round(F.avg(c), e.params["ndigits"]).alias(a)
            )
        elif e.kind == "row_count":
            pass  # rides __n_rows
        elif e.kind == "referential":
            pass  # anti-join below
        else:
            raise ValueError(f"run_expectations: unknown rule kind {e.kind!r}")

    metrics = df.agg(*aggs)

    # ---- verdict rows projected off the one-row metric frame ---------
    verdicts: list[F.Column] = []
    for i, e in enumerate(expectations):
        a = f"__m{i}"
        base = {
            "rule": F.lit(e.name),
            "kind": F.lit(e.kind),
            "column": F.lit(e.column or ""),
        }
        if e.kind == "unique":
            base["column"] = F.lit(",".join(e.params["columns"]))
            viol = F.col(f"{a}_kept") - F.col(f"{a}_distinct")
            if approx:
                # HLL's ~2% band: surplus inside it is indistinguishable
                # from exact; only flag beyond the band.
                band = F.ceil(F.col(f"{a}_kept") * F.lit(0.02)).cast("bigint")
                passed = viol <= band
            else:
                passed = viol == F.lit(0)
            obs = F.col(f"{a}_distinct").cast("string")
        elif e.kind == "row_count":
            lo, hi = e.params["lo"], e.params["hi"]
            n = F.col("__n_rows")
            under = F.when(n < F.lit(lo), F.lit(lo) - n).otherwise(F.lit(0))
            over = (
                F.when(n > F.lit(hi), n - F.lit(hi)).otherwise(F.lit(0))
                if hi is not None else F.lit(0)
            )
            viol = (under + over).cast("bigint")
            passed = viol == F.lit(0)
            obs = n.cast("string")
        elif e.kind == "mean":
            lo, hi = e.params["lo"], e.params["hi"]
            m = F.col(a)
            passed = m.isNotNull() & (m >= F.lit(lo)) & (m <= F.lit(hi))
            viol = F.when(passed, F.lit(0)).otherwise(F.lit(1)).cast("bigint")
            obs = m.cast("string")
        elif e.kind == "referential":
            continue  # handled below
        else:
            viol = F.col(a)
            passed = viol == F.lit(0)
            obs = viol.cast("string")
        verdicts.append(
            F.struct(
                base["rule"].alias("rule"),
                base["kind"].alias("kind"),
                base["column"].alias("column"),
                viol.alias("violations"),
                obs.alias("observed"),
                passed.alias("passed"),
            )
        )

    parts: list[DataFrame] = []
    if verdicts:
        parts.append(
            metrics.select(
                F.explode(F.array(*verdicts)).alias("v")
            ).select("v.*")
        )

    # ---- referential rules: one LEFT ANTI join each -------------------
    for e in expectations:
        if e.kind != "referential":
            continue
        ref_df = refs[e.params["ref"]].select(
            F.col(e.params["ref_column"]).alias("__ref_key")
        )
        dangling = (
            df.select(F.col(e.column).alias("__fk"))
            .where(F.col("__fk").isNotNull())
            .join(ref_df, F.col("__fk") == F.col("__ref_key"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        )
        parts.append(
            dangling.select(
                F.lit(e.name).alias("rule"),
                F.lit(e.kind).alias("kind"),
                F.lit(e.column).alias("column"),
                F.col("violations"),
                F.col("violations").cast("string").alias("observed"),
                (F.col("violations") == F.lit(0)).alias("passed"),
            )
        )

    if not parts:
        return spark.createDataFrame(
            [], "rule string, kind string, column string, "
                "violations bigint, observed string, passed boolean"
        )
    return reduce(lambda x, y: x.unionByName(y), parts).orderBy("rule")


def assert_expectations(
    df: DataFrame,
    expectations: list[Expectation] | tuple[Expectation, ...],
    refs: dict[str, DataFrame] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Gate form: return the report if every rule passed, else raise
    with the failing rows listed (the ``assert_coverage`` idiom —
    collect only the tiny failure set, never the table)."""
    report = run_expectations(df, expectations, refs=refs, approx=approx)
    failed = report.where(~F.col("passed")).collect()
    if failed:
        lines = "; ".join(
            f"{r['rule']} (violations={r['violations']}, observed={r['observed']})"
            for r in failed
        )
        raise AssertionError(f"expectations failed: {lines}")
    return report


#: rule kinds decidable per ROW (routable); the rest are batch-level
ROW_KINDS = ("not_null", "in_range", "values_in", "regex", "referential")


def tag_violations(
    df: DataFrame,
    expectations: list[Expectation] | tuple[Expectation, ...],
    refs: dict[str, DataFrame] | None = None,
    out_col: str = "violations",
) -> DataFrame:
    """Row-level routing form: every input row annotated with
    ``out_col: array<string>`` — the names of the ROW-decidable rules
    it violates (empty array = clean row). Aggregate-kind rules
    (unique / row_count / mean) are batch-level verdicts and are
    rejected here — split a mixed suite with ``row_rules()`` /
    ``batch_rules()``.

    Predicate rules compile to ONE projection (no shuffle, stays in
    whole-stage codegen); each referential rule adds one LEFT join
    against the referenced key set (AQE broadcasts small dims) to flag
    dangling FKs per row.
    """
    refs = refs or {}
    bad = [e.name for e in expectations if e.kind not in ROW_KINDS]
    if bad:
        raise ValueError(
            f"tag_violations: rule(s) {bad!r} are batch-level; "
            f"row-routable kinds are {ROW_KINDS}"
        )
    if out_col in df.columns:
        raise ValueError(f"tag_violations: column {out_col!r} already exists")
    for e in expectations:
        if e.column not in df.columns:
            raise ValueError(
                f"tag_violations: rule {e.name!r} references unknown column "
                f"{e.column!r}; frame has {list(df.columns)!r}"
            )
        if e.kind == "referential" and e.params["ref"] not in refs:
            raise ValueError(
                f"tag_violations: rule {e.name!r} references table "
                f"{e.params['ref']!r} not in refs {sorted(refs)!r}"
            )

    out = df
    flags: list[F.Column] = []
    for i, e in enumerate(expectations):
        c = F.col(e.column)
        if e.kind == "not_null":
            cond = c.isNull()
        elif e.kind == "in_range":
            lo, hi = e.params["lo"], e.params["hi"]
            cond = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
        elif e.kind == "values_in":
            cond = c.isNotNull() & ~c.isin(*e.params["values"])
        elif e.kind == "regex":
            cond = c.isNotNull() & ~c.rlike(e.params["pattern"])
        else:  # referential: flag rows whose non-null FK has no match
            mark = f"__ref_ok_{i}"
            ref_keys = (
                refs[e.params["ref"]]
                .select(F.col(e.params["ref_column"]).alias(e.column))
                .distinct()
                .withColumn(mark, F.lit(True))
            )
            out = out.join(ref_keys, e.column, "left")
            cond = c.isNotNull() & F.col(mark).isNull()
        flags.append(F.when(cond, F.lit(e.name)))
    marks = [x for x in out.columns if x.startswith("__ref_ok_")]
    return out.withColumn(
        out_col,
        F.array_compact(F.array(*flags)) if flags
        else F.array().cast("array<string>"),
    ).drop(*marks)


def row_rules(expectations) -> list[Expectation]:
    return [e for e in expectations if e.kind in ROW_KINDS]


def batch_rules(expectations) -> list[Expectation]:
    return [e for e in expectations if e.kind not in ROW_KINDS]
