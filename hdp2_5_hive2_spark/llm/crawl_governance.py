"""Crawl-governance operators: charset decoding, page policy signals,
robots.txt matching (RFC 9309).

Responsible corpus construction needs more than text extraction — it
needs the COMPLIANCE signals crawls carry:

- `decode_http_body`: bytes → str honoring the real precedence chain
  (BOM, Content-Type charset parameter, `<meta charset>` /
  `http-equiv` declarations, UTF-8 fallback with replacement) so legacy
  pages decode the way browsers decode them.
- `html_policy_audit`: per-page governance signals from the markup —
  robots meta directives (noindex/nofollow/noai and friends), canonical
  URL, declared language, license links (`rel="license"` and Creative
  Commons hrefs). These feed keep/drop and attribution decisions.
- `robots_allowed` / `parse_robots`: the Robots Exclusion Protocol per
  RFC 9309 — group selection by most-specific user-agent token,
  longest-match rule precedence with allow-wins-ties, `*` wildcards and
  `$` end anchors, case-insensitive agent matching.

All are pure functions usable map-side; the Spark wiring is the same
Arrow seam every extractor here uses.
"""

from __future__ import annotations

import re

__all__ = [
    "decode_http_body",
    "html_policy_audit",
    "parse_robots",
    "robots_allowed",
]

_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([\w.-]+)""", re.IGNORECASE
)


def decode_http_body(body: bytes, content_type: str | None = None) -> str:
    """Browser-style charset resolution: BOM > Content-Type charset= >
    <meta> declaration (first 1024 bytes per the HTML spec) > UTF-8,
    always with replacement (crawl bytes are never trusted)."""
    if body[:3] == b"\xef\xbb\xbf":
        return body[3:].decode("utf-8", "replace")
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return body.decode("utf-16", "replace")
    enc = None
    if content_type:
        m = re.search(r"charset\s*=\s*[\"']?([\w.-]+)", content_type, re.I)
        if m:
            enc = m.group(1)
    if enc is None:
        m = _META_CHARSET.search(body[:1024])
        if m:
            enc = m.group(1).decode("ascii", "replace")
    if enc:
        try:
            return body.decode(enc, "replace")
        except LookupError:
            pass
    return body.decode("utf-8", "replace")


def html_policy_audit(html: str) -> dict:
    """Governance signals from page markup: robots directives, canonical
    link, lang attribute, license hrefs (rel=license + CC link hosts)."""
    from html.parser import HTMLParser

    out = {
        "robots": [],          # lowercased directives from <meta name=robots>
        "canonical": None,
        "lang": None,
        "licenses": [],        # hrefs from rel=license / creativecommons links
    }

    class _X(HTMLParser):
        def handle_starttag(self, tag, attrs):
            a = {k.lower(): (v or "") for k, v in attrs}
            if tag == "html" and out["lang"] is None and a.get("lang"):
                out["lang"] = a["lang"].strip().lower()
            elif tag == "meta":
                name = a.get("name", "").lower()
                if name in ("robots", "googlebot") and a.get("content"):
                    out["robots"].extend(
                        d.strip().lower()
                        for d in a["content"].split(",")
                        if d.strip()
                    )
            elif tag in ("link", "a"):
                rel = {r.lower() for r in a.get("rel", "").split()}
                href = a.get("href", "")
                if tag == "link" and "canonical" in rel and href:
                    out["canonical"] = href
                if href and (
                    "license" in rel
                    or "creativecommons.org/licenses" in href.lower()
                ):
                    if href not in out["licenses"]:
                        out["licenses"].append(href)

    x = _X()
    x.feed(html)
    x.close()
    return out


# ---------------------------------------------------------------------------
# RFC 9309 Robots Exclusion Protocol
# ---------------------------------------------------------------------------


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """robots.txt → [(agent_tokens, [(is_allow, pattern), …]), …] groups.
    Consecutive user-agent lines share one group per the RFC; unknown
    directives are ignored; comments strip at '#'."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                collecting_agents = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if val or key == "disallow":
                rules.append((key == "allow", val))
        # sitemap/crawl-delay/unknown: ignored for matching purposes
    if agents:
        groups.append((agents, rules))
    return groups


def _pattern_match_len(pattern: str, path: str) -> int | None:
    """RFC 9309 matching: '*' matches any span, '$' anchors the end.
    Returns the pattern length (specificity) on match, else None —
    implemented as a start-anchored regex translation (escape the
    literal pieces, '.*' between them, '\\Z' for '$')."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in pat.split("*"))
    if anchored:
        rx += r"\Z"
    return len(pattern) if re.match(rx, path) else None


def robots_allowed(robots_txt: str, user_agent: str, path: str) -> bool:
    """Is ``path`` fetchable for ``user_agent``? Group selection picks
    the longest user-agent token that is a substring of the agent
    (falling back to '*'); within the group the LONGEST matching rule
    wins, allow winning length ties; no matching rule → allowed."""
    groups = parse_robots(robots_txt)
    agent = user_agent.lower()
    best_token_len = -1
    chosen: list[tuple[bool, str]] | None = None
    for agents, rules in groups:
        for tok in agents:
            if tok == "*":
                tok_len = 0
            elif tok in agent:
                tok_len = len(tok)
            else:
                continue
            if tok_len > best_token_len:
                best_token_len = tok_len
                chosen = list(rules)
            elif tok_len == best_token_len and chosen is not None:
                chosen.extend(rules)  # multiple groups for the same agent merge
    if not chosen:
        return True
    best_len = -1
    verdict = True
    for is_allow, pattern in chosen:
        if pattern == "":
            continue  # empty Disallow: allows everything (no match)
        m = _pattern_match_len(pattern, path)
        if m is None:
            continue
        if m > best_len or (m == best_len and is_allow and not verdict):
            best_len = m
            verdict = is_allow
    return verdict
