"""Unit semantics for sampling/packing/interpolation operators (the oracle
gate covers cross-engine parity; these pin the operator CONTRACTS on
hand-built frames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.resample import resample_interpolate
from nilm_data_framework_spark.operators.sampling import (
    hash_fraction,
    pack_concat_chunks,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zh")
        .alias("lang"),
    )


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    d = _docs(spark)
    kept1 = stratified_sample(d, "lang", {"en": 0.5, "de": 1.0}, "doc_id").collect()
    kept2 = stratified_sample(d, "lang", {"en": 0.5, "de": 1.0}, "doc_id").collect()
    assert sorted(r.doc_id for r in kept1) == sorted(r.doc_id for r in kept2)
    by_lang = {}
    for r in kept1:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    # rate 1.0 keeps everything, default 0.0 keeps nothing
    assert len(by_lang["de"]) == 133
    assert "zh" not in by_lang
    # rate 0.5 keeps roughly half (md5 is uniform; loose bounds)
    assert 40 <= len(by_lang["en"]) <= 94


def test_stratified_sample_is_nested(spark):
    d = _docs(spark)
    small = {
        r.doc_id
        for r in stratified_sample(d, "lang", {}, "doc_id", default_rate=0.3).collect()
    }
    big = {
        r.doc_id
        for r in stratified_sample(d, "lang", {}, "doc_id", default_rate=0.6).collect()
    }
    assert small <= big  # larger rate strictly grows the kept set


def test_hash_fraction_salt_gives_independent_draw(spark):
    d = _docs(spark, 200)
    a = {r.doc_id for r in d.filter(hash_fraction(F.col("doc_id")) < 0.5).collect()}
    b = {
        r.doc_id
        for r in d.filter(hash_fraction(F.col("doc_id"), salt="x") < 0.5).collect()
    }
    assert a != b  # salted draw differs...
    assert 60 <= len(b) <= 140  # ...but is still ~uniform


def test_pack_concat_chunks_layout(spark):
    rows = [("A", 1, 300), ("A", 2, 300), ("A", 3, 100), ("A", 4, 600), ("B", 5, 0)]
    df = spark.createDataFrame(rows, "shard string, doc_id int, toks int")
    got = {
        r.doc_id: (r.pack_offset, r.pack_chunk, r.pack_chunks_spanned)
        for r in pack_concat_chunks(df, "shard", "doc_id", "toks", budget=512).collect()
    }
    assert got[1] == (0, 0, 1)  # tokens 0..299, inside chunk 0
    assert got[2] == (300, 0, 2)  # 300..599 crosses the 512 boundary
    assert got[3] == (600, 1, 1)  # 600..699, inside chunk 1
    assert got[4] == (700, 1, 2)  # 700..1299 crosses into chunk 2
    assert got[5] == (0, 0, 1)  # zero-token doc spans one chunk by convention


def test_resample_interpolate_linear_fill(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(seconds=30), 4.0),
        (2, t0, 7.0),
    ]
    df = spark.createDataFrame(rows, "house int, ts timestamp, power double")
    out = resample_interpolate(df, ["house"], 10, mean_round_dp=4)
    got = {
        (r.house, r.bucket_ts.second): (r.power, r.filled) for r in out.collect()
    }
    assert got[(1, 0)] == (1.0, False)
    assert got[(1, 10)] == (2.0, True)  # linear blend 1/3 of the way
    assert got[(1, 20)] == (3.0, True)
    assert got[(1, 30)] == (4.0, False)
    assert got[(2, 0)] == (7.0, False)  # single-bucket key: grid of one
    assert len(got) == 5


def test_resample_interpolate_float_path_matches_fixed_point(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 2.0), (1, t0 + dt.timedelta(seconds=40), 10.0)]
    df = spark.createDataFrame(rows, "house int, ts timestamp, power double")
    fixed = resample_interpolate(df, ["house"], 10, mean_round_dp=4)
    floaty = resample_interpolate(df, ["house"], 10)
    fx = {r.bucket_ts: r.power for r in fixed.collect()}
    fl = {r.bucket_ts: r.power for r in floaty.collect()}
    assert fx.keys() == fl.keys()
    for k in fx:
        assert abs(fx[k] - fl[k]) < 1e-4


def test_bottom_k_per_stratum_counts_and_monotonicity(spark):
    from nilm_data_framework_spark.operators.sampling import bottom_k_per_stratum

    d = _docs(spark)  # 400 ids over en/de/zh
    k = 20
    out = bottom_k_per_stratum(d, "lang", k, id_col="doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], set()).add(r["doc_id"])
    assert all(len(v) == k for v in per.values()), "not exactly k per stratum"

    # append-monotone: sampling a SUPERSET corpus can only displace members
    # with smaller hashes — every survivor of the big sample that existed in
    # the small corpus must also survive the small sample.
    small = _docs(spark, 200)
    out_small = bottom_k_per_stratum(small, "lang", k, id_col="doc_id").collect()
    per_small = {}
    for r in out_small:
        per_small.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang, big_ids in per.items():
        survived_from_small = {i for i in big_ids if i < 200}
        assert survived_from_small <= per_small[lang]


def test_bottom_k_stratum_smaller_than_k(spark):
    from nilm_data_framework_spark.operators.sampling import bottom_k_per_stratum

    d = _docs(spark, 9)  # 3 per stratum
    out = bottom_k_per_stratum(d, "lang", 20, id_col="doc_id").collect()
    assert len(out) == 9, "stratum smaller than k must keep every row"


def test_sps_excludes_nonpositive_weights(spark):
    """Zero/NULL/negative weights must have ~zero selection probability —
    u/0 is NULL (sorts FIRST) and previously deterministically WON the
    sample (r7)."""
    from nilm_data_framework_spark.operators.sampling import (
        sequential_poisson_bottom_k,
    )

    rows = [("s", i, 1.0) for i in range(10)] + [
        ("s", 100, 0.0),
        ("s", 101, None),
        ("s", 102, -1.0),
    ]
    df = spark.createDataFrame(rows, "stratum string, id long, w double")
    out = sequential_poisson_bottom_k(df, "stratum", 5, "id", "w").collect()
    assert len(out) == 5
    assert all(r["id"] < 100 for r in out)


def test_bottom_k_excludes_null_ids(spark):
    from nilm_data_framework_spark.operators.sampling import (
        bottom_k_per_stratum,
    )

    rows = [("s", i) for i in range(10)] + [("s", None), ("s", None)]
    df = spark.createDataFrame(rows, "stratum string, id long")
    out = bottom_k_per_stratum(df, "stratum", 3, "id").collect()
    assert len(out) == 3 and all(r["id"] is not None for r in out)


def test_merge_upsert_null_key_does_not_fragment(spark):
    from nilm_data_framework_spark.operators.lakehouse import merge_upsert

    snap = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k long, v double")
    chg = spark.createDataFrame([(None, 9.0)], "k long, v double")
    out = merge_upsert(snap, chg, "k", ["v"]).collect()
    by_key = {r["k"]: r for r in out}
    assert len(out) == 2  # one NULL-key row, not carry+insert fragments
    assert by_key[None]["v"] == 9.0 and by_key[None]["merge_action"] == "update"


def test_psi_drift_null_and_negative_values(spark):
    """NULLs drop (previously binned into the TOP bin — phantom drift);
    negatives clamp to bin 0."""
    from pyspark.sql import functions as F

    from nilm_data_framework_spark.operators.robust import psi_drift

    rows = [("k", None if v is None else float(v), s) for v, s in
            [(10, 1), (10, 0), (-5, 1), (-5, 0), (None, 1)]]
    df = spark.createDataFrame(rows, "key string, value double, is_ref int")
    out = psi_drift(
        df, ["key"], "value", F.col("is_ref") == 1, bin_width=50.0, n_bins=4
    ).collect()[0]
    # identical non-null distributions -> psi 0; the NULL row dropped
    assert out["psi"] == 0.0
    assert out["n_ref"] == 2 and out["n_cmp"] == 2


def test_trimmed_mean_rejects_half_trim(spark):
    from nilm_data_framework_spark.operators.robust import trimmed_mean

    df = spark.createDataFrame([("k", 1.0)], "key string, v double")
    try:
        trimmed_mean(df, ["key"], "v", trim=0.5)
        raise AssertionError("trim=0.5 not rejected")
    except ValueError as e:
        assert "median" in str(e)
