"""Property-based robots parity: the JVM parse (posexplode + regexp +
window, functions/robots.py) and the JVM longest-match block decision
(operators/politeness.py:robots_blocked_col) must equal a plain-Python
line-walk / RFC 9309 §2.2.2 reference on RANDOM inputs — random section
layouts (directives before any User-agent, multiple sections, repeated
``*`` sections, comments, unknown directives, mixed case, empty
Disallow) and random rule-set/path pairs. test_robots.py pins known
files; this searches the space between them. The Python twins below
implement the documented contract independently (module docstring of
functions/robots.py), not by calling the Spark code."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.functions.robots import parse_robots
from isidorus_web_scraper_spark.operators.politeness import robots_blocked_col

# ---------------------------------------------------------------- twins

_UA = re.compile(r"(?i)^user-agent:\s*(\S+)")
_DIS = re.compile(r"(?i)^disallow:\s*(\S+)")
_ALW = re.compile(r"(?i)^allow:\s*(\S+)")
_DEL = re.compile(r"(?i)^crawl-delay:\s*([0-9]+)")


def py_parse(text: str):
    """The documented semantics, walked line-by-line: a directive
    belongs to the most recent preceding User-agent; only ``*`` rules
    kept; empty Disallow/Allow contribute nothing; crawl-delay is the
    max; a file yielding no ``*`` directives parses to None (the host
    drops out and callers apply the permissive default)."""
    cur = None
    dis: list[str] = []
    alw: list[str] = []
    delays: list[int] = []
    for raw in text.split("\n"):
        line = raw.strip()
        m = _UA.match(line)
        if m:
            cur = m.group(1)
            continue
        if cur != "*":
            continue
        m = _DIS.match(line)
        if m:
            dis.append(m.group(1))
            continue
        m = _ALW.match(line)
        if m:
            alw.append(m.group(1))
            continue
        m = _DEL.match(line)
        if m:
            delays.append(int(m.group(1)))
    if not (dis or alw or delays):
        return None
    return (sorted(set(dis)), sorted(set(alw)), max(delays) if delays else 0)


def py_blocked(path, disallow, allow) -> bool:
    """RFC 9309 §2.2.2: most specific (longest) matching rule decides,
    Allow wins equal-length ties, no match ⇒ not blocked, NULL path
    matches nothing."""
    if path is None:
        return False
    d = max((len(p) for p in disallow if path.startswith(p)), default=-1)
    a = max((len(p) for p in allow if path.startswith(p)), default=-1)
    return d > a


# ----------------------------------------------------------- strategies

_seg = st.sampled_from(["a", "b", "img", "x1", "a/b"])
_prefix = st.lists(_seg, min_size=0, max_size=2).map(
    lambda s: "/" + "/".join(s)
)
_ua_token = st.sampled_from(["*", "Googlebot", "isidorus", "*"])

_line = st.one_of(
    _ua_token.map(lambda u: f"User-agent: {u}"),
    _ua_token.map(lambda u: f"user-AGENT:{u}"),
    _prefix.map(lambda p: f"Disallow: {p}"),
    _prefix.map(lambda p: f"disallow:{p}"),
    _prefix.map(lambda p: f"Allow: {p}"),
    st.integers(0, 7).map(lambda d: f"Crawl-delay: {d}"),
    st.sampled_from(
        [
            "",
            "# a comment",
            "Disallow:",  # empty = allow-all idiom, contributes nothing
            "Allow:",
            "Sitemap: http://e.x/s.xml",
            "NoSuch-Directive: /x",
            "  Allow:   /ws  ",  # leading/trailing whitespace
            "Crawl-delay: notanumber",
        ]
    ),
)
_robots_txt = st.lists(_line, min_size=0, max_size=14).map("\n".join)

_rules = st.lists(_prefix, min_size=0, max_size=5)
_path = st.one_of(st.none(), _prefix)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_robots_txt, min_size=1, max_size=8))
def test_jvm_parse_equals_python_on_random_files(spark, texts):
    rows = [(f"h{i}.example", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        r.host: (
            list(r.robots_disallow),
            list(r.robots_allow),
            r.crawl_delay_rounds,
        )
        for r in parse_robots(df).collect()
    }
    want = {
        h: parsed for h, t in rows if (parsed := py_parse(t)) is not None
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cases=st.lists(
        st.tuples(_path, _rules, _rules), min_size=1, max_size=40
    )
)
def test_jvm_longest_match_equals_python(spark, cases):
    df = spark.createDataFrame(
        [(p, d, a) for p, d, a in cases],
        "path string, dis array<string>, alw array<string>",
    )
    got = [
        bool(r.b)
        for r in df.select(
            robots_blocked_col(
                F.col("path"), F.col("dis"), F.col("alw")
            ).alias("b")
        ).collect()
    ]
    want = [py_blocked(p, d, a) for p, d, a in cases]
    assert got == want
