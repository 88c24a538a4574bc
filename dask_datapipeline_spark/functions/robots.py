"""robots.txt parsing + URL allow/deny matching (beyond-reference
LLM-pipeline surface; SURVEY.md §2.2 web-compliance family).

The third compliance signal of the crawl front door, next to the
robots-noindex meta flag (``functions/html.py::html_meta_cols``):
parse each host's robots.txt into a rule table, then decide every URL
by the RFC 9309 / Google semantics —

- group lines under their ``User-agent:`` headers (consecutive UA
  lines share one group); a group applies when it names ``*`` or the
  caller's agent (longest-agent-match groups would need agent lists;
  this implements the common ``*``-plus-exact case);
- among matching ``Allow:``/``Disallow:`` rules, the LONGEST matched
  prefix wins; at equal length ``Allow`` wins;
- no matching rule (or an empty ``Disallow:``) → allowed.

Scale shape: parsing is one Arrow ``mapInPandas`` pass over the
(host, robots_txt) table — a table with one row per HOST, millions of
times smaller than the URL corpus, so the rule table BROADCASTS; the
decision is then a host-keyed broadcast equi-join + a per-URL
``max_by`` aggregation over matched rules — the URL corpus shuffles
ONCE on (url) only if the caller didn't already carry a unique key
(here it groups on the unique url id). Prefix matching is
``startswith`` in codegen; no regex, no Python in the per-URL path.

Determinism: the winner is ``max_by`` over the total order
(prefix_length, is_allow, rule_order) — integer triple, unique per
(url, rule) by construction; decisions are booleans — trivially
hash-exact. Wildcard ``*``/``$`` rule patterns are NOT implemented
(documented subset; rows with them are dropped at parse time so they
can never silently half-match).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULE_SCHEMA = (
    "host string, agent string, is_allow boolean, prefix string, rule_order int"
)


def parse_robots(df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into (host, agent, is_allow, prefix,
    rule_order) rows. Comments (#) stripped, field names
    case-insensitive, CRLF-safe. Rules containing ``*`` or ``$``
    (wildcard syntax) are dropped — the documented subset."""

    def _parse(batches):
        for pdf in batches:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                agents: list[str] = []
                last_was_ua = False
                order = 0
                for raw_line in str(txt or "").replace("\r", "").split("\n"):
                    line = raw_line.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    field, _, value = line.partition(":")
                    field, value = field.strip().lower(), value.strip()
                    if field == "user-agent":
                        if not last_was_ua:
                            agents = []
                        agents.append(value.lower())
                        last_was_ua = True
                        continue
                    last_was_ua = False
                    if field not in ("allow", "disallow"):
                        continue
                    if not value:  # empty Disallow: == allow everything
                        continue
                    if "*" in value or "$" in value:
                        continue  # wildcard subset not implemented
                    for agent in agents or ["*"]:
                        rows.append((host, agent, field == "allow", value, order))
                        order += 1
            yield pd.DataFrame(
                rows,
                columns=["host", "agent", "is_allow", "prefix", "rule_order"],
            )

    return df.select(host_col, txt_col).mapInPandas(_parse, ROBOTS_RULE_SCHEMA)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    agent: str = "*",
) -> DataFrame:
    """``urls`` + an ``allowed`` flag under ``rules`` for ``agent``
    (rules for ``*`` and for ``agent`` both apply). The rule side is
    broadcast (one row per host×rule — bounded); matching is a
    host-keyed equi-join + startswith filter + per-URL ``max_by`` over
    (prefix_length, is_allow) with rule_order as the unique
    tiebreak."""
    r = rules.where(
        (F.col("agent") == F.lit(agent.lower())) | (F.col("agent") == "*")
    ).select(
        F.col("host").alias("__rhost"),
        "is_allow",
        "prefix",
        F.length("prefix").alias("__plen"),
        "rule_order",
    )
    # the startswith lives IN the join condition: a URL whose host has
    # rules but matches none must surface as an unmatched LEFT row
    # (default allow), not be filtered away. The host equi-key keeps
    # this a BroadcastHashJoin with an extra predicate, never a BNLJ.
    matched = (
        urls.join(
            F.broadcast(r),
            (urls[host_col] == F.col("__rhost"))
            & F.col(path_col).startswith(F.col("prefix")),
            "left",
        )
        .groupBy(*[F.col(c) for c in urls.columns])
        .agg(
            F.max_by(
                F.col("is_allow"),
                F.struct(
                    F.coalesce(F.col("__plen"), F.lit(-1)).alias("l"),
                    F.coalesce(F.col("is_allow").cast("int"), F.lit(0)).alias("a"),
                    F.coalesce(F.col("rule_order"), F.lit(-1)).alias("o"),
                ),
            ).alias("__best")
        )
    )
    return matched.select(
        *urls.columns, F.coalesce(F.col("__best"), F.lit(True)).alias("allowed")
    )
