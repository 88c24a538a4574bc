"""Round-7 operators: HTML -> text extraction edge cases (the oracle
row extra:html_extract pins engine parity; these pin the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _extract(spark, cases):
    from dask_datapipeline_spark.functions.html import html_to_text

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, h string"
    )
    return {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }


def test_html_to_text_semantics(spark):
    cases = [
        # script/style dropped WITH content; comments dropped
        ("<p>a</p><script>var x = 1;</script><b>b</b>", "a b"),
        ("<style>p{color:red}</style>hello", "hello"),
        ("x<!-- hidden\nacross lines -->y", "x y"),
        # case-insensitive block tags, attributes on the open tag
        ('<SCRIPT type="text/js">gone()</SCRIPT>kept', "kept"),
        # tag boundaries become spaces, never glue words
        ("<td>one</td><td>two</td>", "one two"),
        # entity decode AFTER tag strip; &amp; decodes LAST so
        # &amp;lt; single-decodes to the literal text &lt;
        ("a &amp;lt; b", "a &lt; b"),
        ("T&amp;C &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;end", 'T&C <x> "q" \'s\' end'),
        # unknown entities stay verbatim (regex tier is honest)
        ("&copy; 2024", "&copy; 2024"),
        # unclosed script keeps content but still strips the tag
        ("<script>leaks()", "leaks()"),
        # bare '<' in prose is NOT a tag (tag must start with a letter)
        ("1 < 2 but <em>3</em>", "1 < 2 but 3"),
        # whitespace collapsed + trimmed
        ("  <p>\n a\t b \n</p> ", "a b"),
    ]
    got = _extract(spark, cases)
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_html_to_text_null_passthrough(spark):
    from dask_datapipeline_spark.functions.html import html_to_text

    df = spark.createDataFrame([(1, None)], "i int, h string")
    assert df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"] is None


def test_html_sql_steps_match_spark(spark):
    """DuckDB replay of the same steps is byte-identical (the catalog
    oracle proves this at sf0.01; this pins it on adversarial strings
    that never appear in the testdata corpus)."""
    import duckdb

    from dask_datapipeline_spark.functions.html import (
        html_to_text,
        html_to_text_sql_steps,
    )

    strs = [
        "<script a=b>x</script ><I>it's</I>",
        "a &amp;amp; b &#39;q&#39;",
        "<!-- -->&nbsp;&nbsp;tail<BR/>",
        "no markup at all",
        "<div onclick=\"f('x')\">q</div>",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "i int, h string")
    spark_out = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(strs):
        lit = "'" + s.replace("'", "''") + "'"
        duck = con.sql(f"SELECT {html_to_text_sql_steps(lit)} AS t").fetchone()[0]
        assert duck == spark_out[i], (s, duck, spark_out[i])
