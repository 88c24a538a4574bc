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
- no matching rule (or an empty ``Disallow:``) → allowed;
- full RFC 9309 pattern syntax: ``*`` matches any byte run, a
  TRAILING ``$`` anchors at the path end; specificity (the
  longest-match tiebreak) is the raw rule text's length, per the
  spec's "most specific based on the length of the path entry".

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
hash-exact. Wildcard rules match through ``regexp_like`` with a
pattern COMPILED AT PARSE TIME in the Java-regex/RE2 common subset
(escaped literals + ``.*`` + an optional end anchor — no lookaround,
no backrefs), so replaying the rule table in another engine decides
identically; plain prefix rules keep the codegen ``startswith`` path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULE_SCHEMA = (
    "host string, agent string, is_allow boolean, prefix string, "
    "pattern string, rule_order int"
)

#: regex metachars to escape when compiling a robots path rule —
#: the Java-regex/RE2 COMMON-subset escaping (no lookaround, no
#: backrefs are ever emitted)
_REGEX_SPECIALS = set(".^$+?()[]{}|\\")


def _robots_pattern(value: str) -> str | None:
    """Anchored regex for a wildcard robots rule, or None for a plain
    prefix rule (the startswith fast path)."""
    if "*" not in value and not value.endswith("$"):
        return None
    body, anchored = value, False
    if body.endswith("$"):
        body, anchored = body[:-1], True
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _REGEX_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return "".join(out)


def parse_robots(df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into (host, agent, is_allow, prefix,
    rule_order) rows. Comments (#) stripped, field names
    case-insensitive, CRLF-safe. Wildcard rules carry a compiled
    ``pattern`` column (``*`` → ``.*``, trailing ``$`` anchors;
    everything else regex-escaped — the escaping is the common
    Java-regex/RE2 subset, so the pattern means the same thing in any
    engine that replays it); plain rules keep ``pattern`` NULL and
    match by ``startswith``, which stays the cheap codegen path."""

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
                    pattern = _robots_pattern(value)
                    for agent in agents or ["*"]:
                        rows.append(
                            (host, agent, field == "allow", value, pattern, order)
                        )
                        order += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "agent", "is_allow", "prefix", "pattern",
                    "rule_order",
                ],
            )

    return df.select(host_col, txt_col).mapInPandas(_parse, ROBOTS_RULE_SCHEMA)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    agent: str = "*",
) -> DataFrame:
    """``urls`` + an ``allowed`` flag under ``rules`` for ``agent``.

    Group selection is RFC 9309 most-specific: on a host that has any
    rules for the EXACT agent, only that group applies and the host's
    ``*`` rows are dropped; the ``*`` group applies only on hosts with
    no exact-agent group (a crawler obeys one group, never the union —
    a stricter ``*`` rule must not flip a named agent's decision).
    The rule side is broadcast (one row per host×rule — bounded), and
    the group selection is a rules-side-only aggregate over the same
    bounded table; matching is a host-keyed equi-join + startswith
    filter + per-URL ``max_by`` over (prefix_length, is_allow) with
    rule_order as the unique tiebreak."""
    a = agent.lower()
    r0 = rules.where((F.col("agent") == F.lit(a)) | (F.col("agent") == "*"))
    if a != "*":
        has_exact = r0.groupBy("host").agg(
            F.max((F.col("agent") == F.lit(a)).cast("int")).alias("__has_exact")
        )
        r0 = (
            r0.join(has_exact, "host")
            .where((F.col("agent") == F.lit(a)) | (F.col("__has_exact") == 0))
            .drop("__has_exact")
        )
    r = r0.select(
        F.col("host").alias("__rhost"),
        "is_allow",
        "prefix",
        "pattern",
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
            & F.when(
                F.col("pattern").isNull(),
                F.col(path_col).startswith(F.col("prefix")),
            ).otherwise(F.regexp_like(F.col(path_col), F.col("pattern"))),
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
