"""Crawl governance (llm/crawl_governance.py): charset resolution chain,
page policy signals, and RFC 9309 robots matching semantics (including
the spec's own examples for longest-match and allow-tie rules)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.crawl_governance import (
    decode_http_body,
    html_policy_audit,
    parse_robots,
    robots_allowed,
)


def test_charset_resolution_chain():
    assert decode_http_body("héllo".encode("utf-8")) == "héllo"
    assert decode_http_body(b"\xef\xbb\xbf" + "bom".encode()) == "bom"
    assert decode_http_body("héllo".encode("utf-16")) == "héllo"
    assert (
        decode_http_body("café".encode("latin-1"), "text/html; charset=ISO-8859-1")
        == "café"
    )
    meta = b'<html><meta charset="windows-1252"><body>' + "naïve".encode("cp1252")
    assert "naïve" in decode_http_body(meta)
    # unknown charset falls back to utf-8 with replacement, never raises
    out = decode_http_body(b"\xff\xfegarbage"[2:], "text/html; charset=not-a-charset")
    assert isinstance(out, str)


def test_policy_audit_signals():
    html = """
    <html lang="en-GB"><head>
      <meta name="robots" content="noindex, nofollow , noai">
      <link rel="canonical" href="https://example.test/page">
      <link rel="license" href="https://example.test/terms">
    </head><body>
      <a rel="license nofollow" href="/mit">MIT</a>
      <a href="https://creativecommons.org/licenses/by/4.0/">CC BY</a>
    </body></html>"""
    a = html_policy_audit(html)
    assert a["robots"] == ["noindex", "nofollow", "noai"]
    assert a["canonical"] == "https://example.test/page"
    assert a["lang"] == "en-gb"
    assert a["licenses"] == [
        "https://example.test/terms", "/mit",
        "https://creativecommons.org/licenses/by/4.0/",
    ]
    assert html_policy_audit("<p>plain</p>") == {
        "robots": [], "canonical": None, "lang": None, "licenses": [],
    }


ROBOTS = """
# comment line
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Allow: /tmp/public*
Disallow: /*.pdf$
Allow: /downloads/ok.pdf$
"""


def test_robots_group_selection_and_rules():
    # specific group wins for a matching agent
    assert not robots_allowed(ROBOTS, "Googlebot/2.1", "/private/x")
    assert robots_allowed(ROBOTS, "Googlebot/2.1", "/tmp/anything")
    # wildcard group for everyone else
    assert not robots_allowed(ROBOTS, "mycrawler", "/tmp/secret")
    assert robots_allowed(ROBOTS, "mycrawler", "/tmp/public/file")
    # $-anchored wildcard rule
    assert not robots_allowed(ROBOTS, "mycrawler", "/docs/file.pdf")
    assert robots_allowed(ROBOTS, "mycrawler", "/docs/file.pdfx")
    # longest-match precedence: the longer Allow overrides the pdf ban
    assert robots_allowed(ROBOTS, "mycrawler", "/downloads/ok.pdf")
    # no rules matched → allowed
    assert robots_allowed(ROBOTS, "mycrawler", "/")
    # empty/absent robots → everything allowed
    assert robots_allowed("", "anybot", "/anything")


def test_robots_rfc_tie_and_merge_semantics():
    txt = """
User-agent: a
Disallow: /x

User-agent: a
Allow: /x/y

User-agent: other
Disallow: /
"""
    # two groups for the same agent merge their rules
    assert not robots_allowed(txt, "a-bot", "/x/z")
    assert robots_allowed(txt, "a-bot", "/x/y")
    # equal-length allow/disallow → allow wins the tie
    tie = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert robots_allowed(tie, "any", "/page")


@settings(max_examples=100, deadline=None)
@given(
    txt=st.text(alphabet=st.characters(min_codepoint=9, max_codepoint=126),
                max_size=300),
    path=st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                 max_size=40),
)
def test_robots_never_raises(txt, path):
    assert robots_allowed(txt, "fuzzbot", "/" + path) in (True, False)
    parse_robots(txt)
