"""robots.txt evaluation — crawl politeness for the web-corpus tier.

A crawl pipeline needs to AUDIT politeness at corpus scale: given the
robots.txt each host served (Common Crawl ships them in the
``robotstxt`` segment) and the (host, agent, path) fetches actually
made, which fetches were allowed? This module parses robots.txt and
evaluates the RFC 9309 access rule entirely in DataFrame expressions:

- **Parse** (``parse_robots``): line split + comment strip +
  ``field: value`` extraction; groups per RFC 9309 §2.1 — consecutive
  ``User-agent`` lines start (and share) a group, rules bind to the
  group above them, rules before any group are ignored. Group
  identity is a running sum over a per-host line window.
- **Evaluate** (``robots_allowed``): group selection by agent — an
  exact (case-insensitive) product-token match beats ``*``; all
  groups at the winning rank merge (RFC: multiple groups for the same
  agent combine). Path rules match with ``*`` wildcards and the ``$``
  end anchor (translated to a per-rule regex by a codegen
  regexp_replace chain); the MOST SPECIFIC match (longest rule octet
  length) decides, ``allow`` winning ties; an empty ``Disallow:``
  matches nothing; no matching group, or no matching rule, means
  allowed (RFC defaults). ``crawl_delay`` (the de-facto extension)
  rides along from the winning group (max when groups merge — the
  conservative wait).

Documented simplifications (each the common-crawler behavior):
``User-agent`` matches the exact token or ``*`` (no substring
product-token prefix match); group adjacency is judged over parsed
field lines (blank/comment lines between two ``User-agent`` lines do
not split a group — RFC 9309 dropped the 1994 blank-line rule);
``Sitemap`` lines parse but do not affect access.

Scale shape: parsing is posexplode + window over O(lines-per-host) —
robots files are KB-sized, so the window partition (host) is tiny;
evaluation is two hash joins on host/(host, group) carrying rule rows,
never page content, and the per-rule regex match is JVM-side
(``regexp_like`` with a column pattern). At 100 TB of fetch logs the
probes shuffle (host, agent, path) triples only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: rule fields that bind to a group; anything else (and malformed
#: lines) drops in the parse
_GROUP_FIELDS = ("user-agent", "allow", "disallow", "crawl-delay")


def parse_robots(
    df: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """(host, group_id, line_no, field, value) per recognized field
    line. ``group_id`` increments at each group start (a User-agent
    line not directly preceded by another parsed User-agent line);
    rules before any group carry group_id 0, which no agent ever
    selects — ignored by construction, as RFC 9309 requires.
    ``Sitemap`` rows parse with their current group_id but are global
    by convention."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("line_no", "__raw"),
    )
    stripped = F.regexp_replace(F.col("__raw"), "#.*$", "")
    field = F.lower(F.trim(F.regexp_extract(stripped, r"^\s*([A-Za-z-]+)\s*:", 1)))
    value = F.trim(F.regexp_extract(stripped, r"^\s*[A-Za-z-]+\s*:(.*)$", 1))
    parsed = (
        lines.select(
            "host", "line_no", field.alias("field"), value.alias("value")
        )
        .filter(F.col("field").isin(*_GROUP_FIELDS, "sitemap"))
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("field") == "user-agent").cast("int")
    starts = (
        (F.col("field") == "user-agent")
        & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    return parsed.withColumn(
        "group_id", F.sum(starts).over(w)
    )


def _rule_regex(pattern: Column) -> Column:
    """robots path pattern → anchored Java regex: every regex
    metacharacter escapes EXCEPT ``*`` (→ ``.*``) and a TRAILING ``$``
    (the end anchor, detected before escaping)."""
    ends = pattern.endswith("$")
    core = F.when(
        ends, pattern.substr(F.lit(1), F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(core, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def robots_allowed(
    parsed: DataFrame,
    probes: DataFrame,
    agent_col: str = "agent",
    path_col: str = "path",
) -> DataFrame:
    """``probes`` (must carry ``host``, ``agent_col``, ``path_col``
    and a caller key making rows unique) → same rows plus ``allowed``
    boolean and ``crawl_delay`` double (NULL when the winning group
    sets none). The RFC 9309 evaluation documented in the module
    docstring."""
    probe_cols = probes.columns
    agents = parsed.filter(F.col("field") == "user-agent").select(
        "host", "group_id", F.lower(F.col("value")).alias("__ua")
    )
    rank = (
        F.when(F.col("__ua") == F.lower(F.col(agent_col)), F.lit(2))
        .when(F.col("__ua") == "*", F.lit(1))
    )
    cand = (
        probes.join(agents, "host")
        .withColumn("__rank", rank)
        .filter(F.col("__rank").isNotNull())
    )
    best = cand.groupBy(*probe_cols).agg(F.max("__rank").alias("__best"))
    chosen = (
        cand.join(best, probe_cols)
        .filter(F.col("__rank") == F.col("__best"))
        .select(*probe_cols, "group_id")
        .distinct()
    )

    rules = parsed.filter(F.col("field").isin("allow", "disallow")).select(
        "host",
        "group_id",
        (F.col("field") == "allow").alias("__is_allow"),
        F.col("value").alias("__pat"),
    ).filter(F.col("__pat") != "")  # empty Disallow: matches nothing
    matched = (
        chosen.join(rules, ["host", "group_id"])
        .withColumn("__rx", _rule_regex(F.col("__pat")))
        .filter(F.regexp_like(F.col(path_col), F.col("__rx")))
        .groupBy(*probe_cols)
        .agg(
            F.max(
                F.struct(
                    F.octet_length("__pat").alias("l"),
                    F.col("__is_allow").alias("a"),
                )
            ).alias("__m")
        )
        .select(*probe_cols, F.col("__m.a").alias("__allowed"))
    )
    delays = parsed.filter(F.col("field") == "crawl-delay").select(
        "host", "group_id", F.col("value").cast("double").alias("__d")
    )
    delay = (
        chosen.join(delays, ["host", "group_id"])
        .groupBy(*probe_cols)
        .agg(F.max("__d").alias("__delay"))  # merged groups: max wait
    )
    return (
        probes.join(matched, probe_cols, "left")
        .join(delay, probe_cols, "left")
        .select(
            *probe_cols,
            F.coalesce(F.col("__allowed"), F.lit(True)).alias("allowed"),
            F.col("__delay").alias("crawl_delay"),
        )
    )
