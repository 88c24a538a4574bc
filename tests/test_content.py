"""DOM-grade main-content extraction (functions/content.py): block
parsing, exact-integer classification rules, neighbor propagation,
and the Arrow DataFrame stage."""

from __future__ import annotations

import pytest

from dask_datapipeline_spark.functions.content import (
    LINK_DENSITY_MUL,
    MIN_BLOCK_CHARS,
    classify_blocks,
    extract_main_content,
    main_content,
    page_blocks,
)

LONG = "word " * 12 + "tail"  # 4*12+4 = 52 non-ws chars, clears the floor


def test_boiler_containers_dropped():
    page = (
        "<body><nav><li>Home</li><li>About</li></nav>"
        f"<p>{LONG}</p>"
        "<footer><p>Copyright 2024 Example, all rights reserved here.</p></footer>"
        "</body>"
    )
    content, n_blocks, n_kept = main_content(page)
    assert content == LONG.strip()
    # nav li ×2 + main p + footer p (footer text clears the length
    # floor — ONLY the container rule removes it)
    assert (n_blocks, n_kept) == (4, 1)


def test_link_density_exact_integer_boundary():
    # 3*link > total is BAD; 3*link == total is NOT — the boundary
    # must sit exactly at density 1/3
    third = [("x" * 10, 30, 10, False)]  # 3*10 == 30 → not link-dominated
    over = [("x" * 10, 29, 10, False)]  # 3*10 > 29 → BAD
    assert classify_blocks(third) == [False]  # short (30 < floor), page start
    assert classify_blocks([("y" * 50, 50, 0, False)] + third) == [True, True]
    assert classify_blocks([("y" * 50, 50, 0, False)] + over) == [True, False]
    assert LINK_DENSITY_MUL == 3


def test_short_inherits_nearest_preceding_non_short():
    good = ("g" * 50, 50, 0, False)
    bad = ("b" * 50, 50, 50, False)
    short = ("s", 1, 0, False)
    # short after good → kept; short after bad → dropped; short at
    # page start → dropped; chained shorts all inherit the same label
    assert classify_blocks([good, short]) == [True, True]
    assert classify_blocks([bad, short]) == [False, False]
    assert classify_blocks([short]) == [False]
    assert classify_blocks([good, short, short, bad, short]) == [
        True, True, True, False, False,
    ]


def test_link_chars_measured_inside_anchor_only():
    page = f'<p><a href="/x">click here now</a> {LONG}</p>'
    blocks = page_blocks(page)
    assert len(blocks) == 1
    text, n, ln, boiler = blocks[0]
    assert ln == len("clickherenow")
    assert n == len((f"click here now {LONG}").strip().replace(" ", ""))
    assert not boiler


def test_skip_tags_content_never_surfaces():
    page = (
        "<head><title>Site Title Words</title><style>p{x:1}</style>"
        "<script>var a = 1 &lt; 2;</script></head>"
        f"<body><p>{LONG}</p></body>"
    )
    content, n_blocks, n_kept = main_content(page)
    assert content == LONG.strip()
    assert (n_blocks, n_kept) == (1, 1)


def test_entities_decoded_once():
    page = f"<p>{LONG} Fish &amp; chips &amp;lt; more</p>"
    content, _, n_kept = main_content(page)
    assert n_kept == 1
    assert content.endswith("Fish & chips &lt; more")


def test_malformed_html_never_raises():
    # unclosed tags, stray end tags, truncated entity, byte salad
    for page in [
        f"<p>{LONG}",  # unclosed p: flushed at close()
        f"</div></p><p>{LONG}</p>",
        f"<p>{LONG} &am",
        "<<<>>>" + LONG,
        "",
    ]:
        content, n_blocks, n_kept = main_content(page)
        assert isinstance(content, str)
    assert main_content(f"<p>{LONG}")[2] == 1  # unclosed still kept


def test_nested_boiler_containers():
    page = (
        f"<header><nav><li>Home</li></nav><p>{LONG}</p></header>"
        f"<p>{LONG}</p>"
    )
    content, n_blocks, n_kept = main_content(page)
    # the long paragraph INSIDE header is still boilerplate; depth
    # tracking must survive the inner nav close
    assert content == LONG.strip()
    assert (n_blocks, n_kept) == (3, 1)


def test_single_br_is_a_word_separator_not_a_split():
    # one <br> stays IN the block, contributing a word separator —
    # whitespace, so no measure changes; <br/> spelling is identical
    for br in ("<br>", "<br/>", "<br />"):
        content, n_blocks, n_kept = main_content(f"<p>{LONG}{br}follow up</p>")
        assert n_blocks == 1 and n_kept == 1
        assert content == f"{LONG.strip()} follow up"


def test_br_run_flushes_a_block():
    # >=2 consecutive <br> (whitespace-only between) is a paragraph
    # break: two blocks, the short second kept by the first's context
    for sep in ("<br><br>", "<br/><br>", "<br> \n\t <br>", "<br><br><br>"):
        content, n_blocks, n_kept = main_content(f"<p>{LONG}{sep}follow up</p>")
        assert n_blocks == 2 and n_kept == 2, sep
        assert content == f"{LONG.strip()}\nfollow up"
    # non-whitespace text between brs ends the run: still one block
    content, n_blocks, n_kept = main_content(f"<p>{LONG}<br>x<br>y</p>")
    assert n_blocks == 1 and content == f"{LONG.strip()} x y"


def test_br_split_separates_link_density():
    # the <br><br> flush is what keeps a trailing link list from
    # diluting the prose block it used to share (the rule's point)
    links = '<a href="/a">one two three four five six seven eight</a>'
    page = f"<div>{LONG}<br><br>{links} {links}</div>"
    content, n_blocks, n_kept = main_content(page)
    assert n_blocks == 2
    assert (content, n_kept) == (LONG.strip(), 1)  # link block dropped
    # without the split the page is one merged block whose link share
    # exceeds 1/3 — the PROSE dies with the link list (the failure
    # mode the flush exists to prevent)
    merged, m_blocks, m_kept = main_content(page.replace("<br><br>", " "))
    assert m_blocks == 1 and m_kept == 0 and merged == ""


def test_br_inside_skip_tags_ignored():
    content, n_blocks, n_kept = main_content(
        f"<p>ab<script>x<br><br>y</script>cd{LONG}</p>"
    )
    assert n_blocks == 1 and n_kept == 1
    assert content == f"abcd{LONG.strip()}"


def test_null_and_empty_page():
    assert main_content(None) == (None, 0, 0)
    assert main_content("") == ("", 0, 0)
    assert main_content("<body>   \n\t  </body>") == ("", 0, 0)


def test_min_block_chars_counts_non_whitespace():
    words = "ab " * (MIN_BLOCK_CHARS // 2)  # non-ws = 2 per word
    exactly = "<p>" + words + "</p>"  # non-ws == MIN_BLOCK_CHARS
    under = "<p>" + "ab " * (MIN_BLOCK_CHARS // 2 - 1) + "</p>"
    assert main_content(exactly)[2] == 1
    assert main_content(under)[2] == 0  # short at page start → dropped


def test_blocks_joined_with_newline_in_document_order():
    page = f"<p>{LONG}</p><p>Then a short follow-up.</p><p>{LONG} again</p>"
    content, n_blocks, n_kept = main_content(page)
    assert n_kept == 3
    assert content.split("\n") == [
        LONG.strip(),
        "Then a short follow-up.",
        f"{LONG} again".strip(),
    ]


def test_dataframe_stage(spark):
    df = spark.createDataFrame(
        [
            (1, f"<nav><li>Home</li></nav><p>{LONG}</p>"),
            (2, None),
            (3, "<p>too short</p>"),
        ],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in extract_main_content(df).collect()}
    assert rows[1]["content"] == LONG.strip()
    assert (rows[1]["n_blocks"], rows[1]["n_kept"]) == (2, 1)
    assert rows[2]["content"] is None
    assert (rows[2]["n_blocks"], rows[2]["n_kept"]) == (0, 0)
    assert rows[3]["content"] == ""
    assert rows[3]["n_kept"] == 0
    # keep_cols pass through with their types
    df2 = df.withColumn("lang", F_lit_en())
    out = extract_main_content(df2, keep_cols=("doc_id", "lang"))
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "lang", "content", "n_blocks", "n_kept",
    ]


def F_lit_en():
    from pyspark.sql import functions as F

    return F.lit("en")


def test_stage_plan_is_single_arrow_pass(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = extract_main_content(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # no shuffle anywhere in the stage
