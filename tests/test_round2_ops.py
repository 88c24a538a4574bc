"""Round-2 operators: KMV distinct sketch (operators/sketches.py),
unigram-LM perplexity (operators/lm.py), PII redaction
(functions/text.py), epoch mixing (operators/sampling.py), ORC
round-trip (sources)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dask_datapipeline_spark.functions.text import pii_counts, redact_pii
from dask_datapipeline_spark.operators.lm import perplexity_scores
from dask_datapipeline_spark.operators.sampling import epoch_mix
from dask_datapipeline_spark.operators.sketches import kmv_distinct


# ------------------------------- KMV --------------------------------


@pytest.fixture(scope="module")
def grouped_vals(spark):
    # group a: 2000 distinct values; group b: 40 distinct (< k)
    rows = [("a", f"v{i}") for i in range(2000)] + [
        ("b", f"w{i % 40}") for i in range(400)
    ]
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_small_group_is_exact(spark, grouped_vals):
    out = {r.g: r for r in kmv_distinct(grouped_vals, ["g"], "v", k=128).collect()}
    assert out["b"].n_sketch == 40
    assert out["b"].est_distinct == 40.0


def test_kmv_estimate_accuracy(spark, grouped_vals):
    out = {r.g: r for r in kmv_distinct(grouped_vals, ["g"], "v", k=128).collect()}
    assert out["a"].n_sketch == 128
    # k=128 -> ~9% std error; 25% bound keeps the test deterministic-safe
    assert 1500 < out["a"].est_distinct < 2500


def test_kmv_is_partitioning_independent(spark, grouped_vals):
    a = sorted(map(tuple, kmv_distinct(grouped_vals, ["g"], "v", k=64).collect()))
    b = sorted(
        map(
            tuple,
            kmv_distinct(grouped_vals.repartition(17), ["g"], "v", k=64).collect(),
        )
    )
    assert a == b


def test_kmv_ignores_nulls_and_dups(spark):
    rows = [("g", "x"), ("g", "x"), ("g", None), ("g", "y")]
    df = spark.createDataFrame(rows, "g string, v string")
    out = kmv_distinct(df, ["g"], "v", k=8).collect()
    assert len(out) == 1 and out[0].n_sketch == 2 and out[0].est_distinct == 2.0


# -------------------------- LM perplexity ----------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "zyxq wvut zyxq"))  # all-OOV under min_count=2... except dups
    rows.append((101, None))
    rows.append((102, ""))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_perplexity_orders_common_before_rare(spark, corpus):
    out = {r.doc_id: r for r in perplexity_scores(corpus, min_count=2).collect()}
    assert out[0].avg_nll < out[100].avg_nll
    assert out[0].n_tok == 6
    # every common doc scores identically
    assert out[0].avg_nll == out[19].avg_nll


def test_perplexity_excludes_null_and_empty(spark, corpus):
    ids = {r.doc_id for r in perplexity_scores(corpus, min_count=2).collect()}
    assert 101 not in ids and 102 not in ids


def test_perplexity_keep_flag_consistent(spark, corpus):
    for r in perplexity_scores(corpus, min_count=2, threshold=3.0).collect():
        assert r.keep == (r.avg_nll <= 3.0)


# ------------------------------- PII --------------------------------


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and 555-123-4567 ssn 123-45-6789"),
        (2, "clean text with numbers 12345 and dots a.b"),
        (3, "two mails x@y.io z@w.org"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    c = pii_counts("t")
    got = {
        r.i: r
        for r in df.select(
            "i",
            *[v.alias(k) for k, v in c.items()],
            redact_pii("t").alias("red"),
        ).collect()
    }
    assert (got[1].email, got[1].phone, got[1].ssn) == (1, 1, 1)
    assert got[1].red == "mail <EMAIL> and <PHONE> ssn <SSN>"
    assert (got[2].email, got[2].phone, got[2].ssn) == (0, 0, 0)
    assert got[2].red == rows[1][1]
    assert got[3].email == 2 and got[3].red == "two mails <EMAIL> <EMAIL>"


def test_pii_phone_is_not_ssn(spark):
    df = spark.createDataFrame([(1, "call 555-123-4567")], "i long, t string")
    r = df.select(*[v.alias(k) for k, v in pii_counts("t").items()]).collect()[0]
    assert r.phone == 1 and r.ssn == 0


# ---------------------------- epoch mix ------------------------------


def test_epoch_mix_replicates_by_weight(spark):
    rows = [(1, "en"), (2, "de"), (3, "fr"), (4, "junk")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_mix(df, "doc_id", "lang", {"en": 3, "de": 2, "junk": 0}).collect()
    per = {}
    for r in out:
        per.setdefault(r.doc_id, []).append(r.copy_idx)
    assert sorted(per[1]) == [1, 2, 3]
    assert sorted(per[2]) == [1, 2]
    assert sorted(per[3]) == [1]
    assert 4 not in per  # weight 0 drops, never duplicates (seq(1,0) trap)
    assert len({r.mix_key for r in out}) == len(out)


def test_epoch_mix_rejects_bad_weight(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        epoch_mix(df, "doc_id", "lang", {"en": -1})


# ------------------------------- ORC --------------------------------


def test_orc_roundtrip_preserves_rows_and_schema(spark, sf_dir):
    from dask_datapipeline_spark.sources.readers import load_testdata, scan_orc
    from dask_datapipeline_spark.sources.writers import write_orc

    sup = load_testdata(spark, sf_dir, "supplier")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/supplier_orc"
        assert write_orc(sup, path)
        back = scan_orc(spark, path)
        assert back.schema == sup.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sup.collect()))


def test_orc_scan_prunes_columns(spark, sf_dir):
    from dask_datapipeline_spark.sources.readers import load_testdata, scan_orc
    from dask_datapipeline_spark.sources.writers import write_orc

    sup = load_testdata(spark, sf_dir, "supplier")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/supplier_orc"
        write_orc(sup, path)
        plan = scan_orc(
            spark, path, columns=["s_suppkey"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "s_acctbal" not in plan
