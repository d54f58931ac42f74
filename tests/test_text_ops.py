

def test_compression_ratio_signal_and_determinism(spark):
    """Repetitive text compresses below prose; ratio matches a direct
    zlib reference exactly; empty/null -> null; filter band works."""
    import zlib

    from ensembl_database_loader_spark.operators.textstats import (
        filter_by_compression,
        with_compression_ratio,
    )

    prose = "the quick brown fox jumps over the lazy dog near the river bank"
    spam = "buy now " * 50
    rows = [(1, prose), (2, spam), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: r.compression_ratio for r in with_compression_ratio(df).collect()}

    def ref(t):
        b = t.encode()
        return round(len(zlib.compress(b, 6)) / len(b), 4)

    assert got[1] == ref(prose)
    assert got[2] == ref(spam)
    assert got[3] is None and got[4] is None
    assert got[2] < got[1]  # repetition compresses harder
    kept = {r.id for r in filter_by_compression(df, min_ratio=got[2] + 0.01).collect()}
    assert kept == {1}
    import pytest

    with pytest.raises(ValueError, match="level"):
        with_compression_ratio(df, level=0)


def test_pseudonymize_preserves_joins_and_determinism(spark):
    """Same value + secret -> same token (joins survive); different
    secret or column name -> different token; nulls stay null."""
    import hashlib

    import pytest

    from ensembl_database_loader_spark.operators.redact import pseudonymize

    orders = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "oid int, custkey int"
    )
    cust = spark.createDataFrame([(10, "a"), (20, "b"), (30, "c")],
                                 "custkey int, name string")
    po = pseudonymize(orders, ("custkey",), "s3cret")
    pc = pseudonymize(cust, ("custkey",), "s3cret")
    # FK joinability preserved: 2 matches, exactly as with raw keys
    assert po.join(pc, "custkey").count() == 2
    tok = {r.oid: r.custkey for r in po.collect()}
    ref = hashlib.sha256(b"s3cret:custkey:10").hexdigest()[:16]
    assert tok[1] == ref
    assert tok[3] is None
    # different secret unlinks
    po2 = pseudonymize(orders, ("custkey",), "other")
    assert {r.custkey for r in po2.collect() if r.custkey} != {
        v for v in tok.values() if v
    }
    # column name folded in: same value in another column != same token
    other = pseudonymize(
        orders.selectExpr("custkey AS uid"), ("uid",), "s3cret"
    )
    assert {r.uid for r in other.collect()}.isdisjoint(
        {v for v in tok.values() if v}
    )
    with pytest.raises(ValueError, match="unknown column"):
        pseudonymize(orders, ("nope",), "s")
    with pytest.raises(ValueError, match="token_len"):
        pseudonymize(orders, ("custkey",), "s", token_len=4)
