

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
