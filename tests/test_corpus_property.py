"""Property tests (hypothesis) for the corpus-construction primitives.
Pure-Python properties — no SparkSession needed, so these run in
milliseconds and explore edge cases the example tests can't."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ensembl_database_loader_spark.operators.packing import _ffd_pack


@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=120),
    st.integers(min_value=10, max_value=100),
)
@settings(max_examples=300, deadline=None)
def test_ffd_pack_invariants(token_counts, budget):
    pdf = pd.DataFrame(
        {"shard": 1, "id": range(len(token_counts)), "n_tokens": token_counts}
    )
    out = _ffd_pack(pdf, budget)
    # every doc exactly once
    assert sorted(out["id"]) == list(range(len(token_counts)))
    # token counts preserved
    assert out["n_tokens"].sum() == sum(token_counts)
    g = out.groupby("pack_id").agg(
        tokens=("n_tokens", "sum"), oversize=("oversize", "max"), n=("id", "count")
    )
    # regular packs obey the budget; oversize packs are single-doc
    assert (g.loc[~g["oversize"], "tokens"] <= budget).all()
    assert (g.loc[g["oversize"], "n"] == 1).all()
    # oversize flag is exactly "doc bigger than budget"
    assert set(out.loc[out["oversize"], "n_tokens"]) <= {
        t for t in token_counts if t > budget
    }
    # first-fit bound: at most one REGULAR pack is <= half-full
    reg = g.loc[~g["oversize"], "tokens"]
    assert (reg * 2 <= budget).sum() <= 1
    # the SQL-checkable bound packing_report gates
    total_reg = reg.sum()
    assert len(reg) <= (2 * int(total_reg)) // budget + 1


@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=80),
    st.integers(min_value=10, max_value=100),
)
@settings(max_examples=200, deadline=None)
def test_ffd_pack_is_permutation_invariant(token_counts, budget):
    """Sorting inside _ffd_pack makes input row order irrelevant."""
    pdf = pd.DataFrame(
        {"shard": 0, "id": range(len(token_counts)), "n_tokens": token_counts}
    )
    a = _ffd_pack(pdf, budget).sort_values("id").reset_index(drop=True)
    b = (
        _ffd_pack(pdf.sample(frac=1.0, random_state=7), budget)
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def _chunk_reference(text: str, size: int, step: int) -> list[tuple[int, str, int]]:
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    toks = ws.sub(" ", text.strip(" ").lower()).split(" ")
    if toks == [""]:
        return []
    out = []
    for idx, i in enumerate(range(0, len(toks), step)):
        c = toks[i : i + size]
        out.append((idx, " ".join(c), len(c)))
    return out


@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=60), min_size=1, max_size=6
    ),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=11),
)
@settings(max_examples=40, deadline=None)
def test_chunk_udtf_matches_reference(texts, size, overlap):
    """The UDTF generator (pure Python, no Spark needed to call eval)
    matches the reference splitter for arbitrary whitespace mess."""
    if overlap >= size:
        overlap = size - 1
    from ensembl_database_loader_spark.operators.chunking import chunk_udtf

    cls = chunk_udtf(size, overlap)
    # unwrap the UDTF to its eval generator
    impl = cls.func() if callable(getattr(cls, "func", None)) else None
    if impl is None:  # pyspark wraps the class; instantiate the inner type
        impl = cls.__wrapped__() if hasattr(cls, "__wrapped__") else None
    assert impl is not None, "cannot unwrap udtf class"
    for t in texts:
        got = list(impl.eval(t))
        assert got == _chunk_reference(t, size, size - overlap)


def test_keyed_hash_golden_values():
    """Golden values of the Knuth fold — guards the constants against
    accidental edits (the Spark/DuckDB twin expressions hard-code the
    same numbers, so a drifted constant would silently fork the
    sample)."""
    from ensembl_database_loader_spark.operators.mixing import HASH_SPACE, KNUTH

    assert KNUTH == 2654435761 and HASH_SPACE == 4294967296
    assert [(i * KNUTH) % HASH_SPACE for i in (0, 1, 2, 97, 10**6)] == [
        0,
        2654435761,
        1013904226,
        4077198353,
        4238151232,
    ]


# --- r7 operators vs pure-Python references ---------------------------------


def _norm_py(text: str) -> list[str]:
    """The engine's normalization: lower, trim, collapse whitespace,
    split on single spaces ('' -> [''])."""
    return re.sub(r"\s+", " ", text.lower().strip()).split(" ")


def _ref_exactsubstr(docs: dict[int, str], w: int) -> dict[int, tuple[str, int, int]]:
    toks = {i: _norm_py(t) for i, t in docs.items()}

    def windows(ts):
        if len(ts) < w or (len(ts) == 1 and ts[0] == ""):
            return []
        return [tuple(ts[s : s + w]) for s in range(len(ts) - w + 1)]

    from collections import Counter

    counts = Counter(win for ts in toks.values() for win in windows(ts))
    dup = {win for win, c in counts.items() if c >= 2}
    out = {}
    for i, ts in toks.items():
        starts = [s for s, win in enumerate(windows(ts)) if win in dup]
        covered = set()
        for s in starts:
            covered.update(range(s, s + w))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def test_remove_duplicate_spans_property_wrapper(spark):
    """Drives the hypothesis strategy with the session fixture (the
    @given decorator can't take pytest fixtures directly)."""
    from hypothesis import given as h_given
    from hypothesis import settings as h_settings

    from ensembl_database_loader_spark.operators.substrdedup import (
        remove_duplicate_spans,
    )

    # 8 examples (was 20): each example is a full Spark action (the
    # cost is engine round trips, not case breadth) and the pure-
    # Python reference properties above run 200-300 examples on the
    # same primitives — suite-budget item, VERDICT r12 #4
    @h_settings(max_examples=8, deadline=None)
    @h_given(
        st.dictionaries(
            st.integers(0, 50),
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
            ).map(" ".join),
            min_size=1,
            max_size=8,
        ),
        st.integers(2, 4),
    )
    def run(docs, w):
        ref = _ref_exactsubstr(docs, w)
        df = spark.createDataFrame(list(docs.items()), "id bigint, text string")
        for method in ("fold", "explode"):
            got = {
                r.id: (r.clean_text, r.n_tokens, r.n_removed)
                for r in remove_duplicate_spans(
                    df, "id", "text", w, method=method
                ).collect()
            }
            assert got == ref, (method, docs, w)

    run()


def test_token_budget_property_wrapper(spark):
    """Bucketed token-budget selection vs the pure-Python reference:
    sort by ((id*K) mod 2^32, id) per stratum, keep while before <
    budget."""
    from hypothesis import given as h_given
    from hypothesis import settings as h_settings

    from ensembl_database_loader_spark.operators.budget import select_token_budget
    from ensembl_database_loader_spark.operators.mixing import HASH_SPACE, KNUTH

    # 8 examples (was 20): each example is a full Spark action (the
    # cost is engine round trips, not case breadth) and the pure-
    # Python reference properties above run 200-300 examples on the
    # same primitives — suite-budget item, VERDICT r12 #4
    @h_settings(max_examples=8, deadline=None)
    @h_given(
        st.lists(
            st.tuples(
                st.integers(0, 10**7),
                st.sampled_from(["x", "y"]),
                st.integers(0, 40),
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda r: r[0],
        ),
        st.integers(0, 300),
        st.integers(2, 64),
    )
    def run(rows, bud, nb):
        ref = set()
        for lang in ("x", "y"):
            acc = 0
            for i, _, tok in sorted(
                (r for r in rows if r[1] == lang),
                key=lambda r: ((r[0] * KNUTH) % HASH_SPACE, r[0]),
            ):
                if acc < bud:
                    ref.add(i)
                acc += tok
        df = spark.createDataFrame(rows, "id bigint, lang string, n_tokens bigint")
        got = {
            r.id
            for r in select_token_budget(
                df, "id", "n_tokens", "lang", {"x": bud, "y": bud}, n_buckets=nb
            ).collect()
        }
        assert got == ref, (rows, bud, nb)

    run()
