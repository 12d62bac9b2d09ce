"""Capstone integration: the crawl front door composed end to end —
WARC archives → robots/policy governance → charset-correct HTML text →
the corpus_filter funnel — using only the shipped operators, the way a
real ingestion job chains them."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.llm import curation
from hdp2_5_hive2_spark.llm.crawl_governance import (
    decode_http_body,
    html_policy_audit,
    robots_allowed,
)
from hdp2_5_hive2_spark.llm.warc import (
    build_warc_gz,
    http_response_payload,
    read_warc,
    split_http_response,
)

ROBOTS = "User-agent: *\nDisallow: /private/\n"

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "the quiet field while the morning light slowly fills the open sky"
)


def _page(body_html: str, charset: str = "utf-8") -> bytes:
    return http_response_payload(
        body_html.encode(charset), f"text/html; charset={charset}"
    )


def test_front_door_end_to_end(spark, tmp_path):
    pages = [
        ("http://site.test/a", _page(f"<html><body><p>{GOOD} alpha</p></body></html>")),
        ("http://site.test/noai", _page(
            f"<html><head><meta name='robots' content='noindex, noai'></head>"
            f"<body><p>{GOOD} hidden</p></body></html>")),
        ("http://site.test/private/x", _page(f"<html><body><p>{GOOD} secret</p></body></html>")),
        ("http://site.test/dup", _page(f"<html><body><p>{GOOD} alpha</p></body></html>")),
        ("http://site.test/latin", _page(
            f"<html><body><p>{GOOD} café naïve</p></body></html>", "ISO-8859-1")),
        ("http://site.test/junk", _page("<html><body><p>x 1 2</p></body></html>")),
    ]
    recs = [
        {
            "warc_type": "response",
            "target_uri": uri,
            "payload": payload,
            "content_type": "application/http;msgtype=response",
        }
        for uri, payload in pages
    ]
    p = str(tmp_path / "seg-00000.warc.gz")
    with open(p, "wb") as f:
        f.write(build_warc_gz(recs))

    records = read_warc(spark, [p])

    # governance + charset-correct extraction, composed map-side
    def extract(batches):
        from urllib.parse import urlparse

        from hdp2_5_hive2_spark.llm.warc import html_to_text

        for b in batches:
            rows = []
            for uri, wtype, payload in zip(
                b["target_uri"], b["warc_type"], b["payload"]
            ):
                if wtype != "response":
                    continue
                status, headers, body = split_http_response(bytes(payload))
                if not robots_allowed(ROBOTS, "corpusbot", urlparse(uri).path):
                    continue
                html = decode_http_body(body, headers.get("content-type"))
                policy = html_policy_audit(html)
                if {"noindex", "noai"} & set(policy["robots"]):
                    continue
                rows.append((uri, html_to_text(html)))
            yield pd.DataFrame(rows, columns=["uri", "text"])

    docs = (
        records.mapInPandas(extract, "uri string, text string")
        .withColumn("doc_id", F.xxhash64("uri"))
        .withColumn("lang", F.lit("en"))
    )
    kept_uris = {
        r.uri
        for r in docs.join(
            curation.corpus_filter(docs).filter("keep").select("doc_id"), "doc_id"
        ).collect()
    }
    # noai + robots-disallowed + quality-junk dropped; one of the two
    # identical pages survives exact dedup; the latin-1 page decoded right
    assert "http://site.test/noai" not in kept_uris
    assert "http://site.test/private/x" not in kept_uris
    assert "http://site.test/junk" not in kept_uris
    assert "http://site.test/latin" in kept_uris
    assert len(kept_uris & {"http://site.test/a", "http://site.test/dup"}) == 1
    assert len(kept_uris) == 2
    # and the charset path preserved the accents through the whole chain
    latin_text = docs.filter(F.col("uri") == "http://site.test/latin").first().text
    assert "café naïve" in latin_text
