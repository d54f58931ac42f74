"""Equivalence tests for skew-salting transforms and the custom
stateful streaming operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from ensembl_database_loader_spark.catalog import table
from ensembl_database_loader_spark.operators.skew import salted_group_count, salted_join

SF = "/root/testdata/sf0.001"


def test_salted_group_count_equivalence(spark):
    li = table(spark, SF, "lineitem")
    plain = {
        r.l_returnflag: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    salted = {
        r.l_returnflag: r["count"]
        for r in salted_group_count(li, "l_returnflag").collect()
    }
    assert salted == plain


def test_salted_join_equivalence(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    # plain vs salted: identical multiset of joined rows
    plain = (
        li.join(o, "l_orderkey")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
        )
        .first()
    )
    salted = (
        salted_join(li, o, "l_orderkey", num_salts=8)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
        )
        .first()
    )
    assert (salted.n, salted.s) == (plain.n, plain.s)


def test_running_user_profile_stateful_stream(spark, tmp_path):
    from ensembl_database_loader_spark.streaming.stateful import running_user_profile
    from ensembl_database_loader_spark.streaming.windows import stream_events

    events = stream_events(spark, SF)
    prof = running_user_profile(events)
    assert prof.isStreaming
    q = (
        prof.writeStream.format("memory")
        .queryName("user_profiles_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, cnt, ROUND(total, 2) AS total FROM user_profiles_test"
    ).toPandas()
    # batch oracle: per-user count + sum over the whole fixture
    exp = (
        table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .toPandas()
    )
    g = got.sort_values("user_id").reset_index(drop=True)
    e = exp.sort_values("user_id").reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["cnt"].values == e["cnt"].values).all()
    assert (abs(g["total"].values - e["total"].values) < 1e-6).all()


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew handling is the complement of the manual
    salted join (q51 / operators/skew.py):

    - AQE skew-join applies when skew shows up at RUNTIME in a
      sort-merge join's shuffle sizes — it splits the oversized
      partition into advisory-sized reads with no query rewrite. Use
      it by default: zero code, reacts to the skew you actually have.
    - Manual salting applies when the skew is KNOWN and structural
      (one hot key dominating every run), when the join must be a
      shuffled hash join, or for skewed AGGREGATIONS (AQE's skew
      handling only covers joins) — at the cost of exploding the dim
      side by the salt factor.

    This gate pins that AQE actually triggers: a 500k-row fact with
    80% of rows on one key, sort-merge-joined (broadcast disabled)
    against a 101-row dim, must mark the join skew=true and read the
    hot partition as skewed splits."""
    fact = spark.range(500000).select(
        F.when(F.col("id") < 400000, 0).otherwise(F.col("id") % 100 + 1).alias("k"),
        F.rand(7).alias("v"),
    )
    dim = spark.range(101).select(F.col("id").alias("k"), F.rand(8).alias("w"))
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {c: spark.conf.get(c, None) for c in confs}
    try:
        for c, v in confs.items():
            spark.conf.set(c, v)
        q = fact.join(dim, "k").select(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for c, v in prev.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_key_skew_profile_values(spark):
    from ensembl_database_loader_spark.operators.skew import key_skew_profile

    # 1 hot key (80 rows) + 20 uniform keys (2 rows each)
    rows = [(0,)] * 80 + [(k,) for k in range(1, 21) for _ in range(2)]
    df = spark.createDataFrame(rows, "k bigint")
    r = key_skew_profile(df, "k").first()
    assert (r.n_keys, r.n_rows, r.max_freq) == (21, 120, 80)
    assert r.p50 == 2.0
    assert r.top_share == round(80 / 120, 6)
    # sampled path: ratios survive, exact counts don't (just shape-check)
    s = key_skew_profile(df, "k", sample_fraction=0.5).first()
    assert s.n_rows < 120 and s.n_keys <= 21


def test_hot_key_split_join_equivalence_and_plan(spark):
    from ensembl_database_loader_spark.operators.skew import hot_key_split_join

    # big side: key 7 is hot (500 rows), keys 0..49 cold (4 rows each)
    big = spark.createDataFrame(
        [(7, i) for i in range(500)] + [(k, i) for k in range(50) for i in range(4)],
        "k bigint, payload bigint",
    )
    # even cold keys only + the hot key once (odd cold keys unmatched)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 50, 2)] + [(7, "dim7b")],
        "k bigint, attr string",
    )
    plain = big.join(small, "k")
    split = hot_key_split_join(big, small, "k", hot_min_rows=100)
    key_fn = lambda r: (r.k, r.payload, r.attr)  # noqa: E731
    assert sorted(map(key_fn, split.collect())) == sorted(map(key_fn, plain.collect()))
    # the hot path must be a broadcast join (no shuffle of hot rows)
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hot_key_split_join_duplicate_small_rows(spark):
    """Multiplicity preserved when the small side has duplicate keys
    (each big-hot row must pair with EVERY matching small row, once)."""
    from ensembl_database_loader_spark.operators.skew import hot_key_split_join

    big = spark.createDataFrame([(1, i) for i in range(10)] + [(2, 0)], "k bigint, p bigint")
    small = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k bigint, attr string")
    plain = sorted((r.k, r.p, r.attr) for r in big.join(small, "k").collect())
    split = sorted(
        (r.k, r.p, r.attr)
        for r in hot_key_split_join(big, small, "k", hot_min_rows=5).collect()
    )
    assert split == plain
