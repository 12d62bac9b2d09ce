"""WARC ingestion (llm/warc.py): record grammar, per-member gz ranged
access, HTTP split, HTML text extraction, the Spark read/extract
operators, and the ValueError-only fuzz contract."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.warc import (
    build_warc,
    build_warc_gz,
    html_to_text,
    http_response_payload,
    parse_warc,
    parse_warc_gz,
    read_warc,
    split_http_response,
    warc_gz_member_ranges,
    warc_text_extract,
)


def _recs(n=3):
    out = [{"warc_type": "warcinfo", "payload": b"software: t\r\n"}]
    for i in range(n):
        body = f"<html><body><p>page {i}</p></body></html>".encode()
        out.append(
            {
                "warc_type": "response",
                "target_uri": f"http://example.test/{i}",
                "payload": http_response_payload(body),
                "content_type": "application/http;msgtype=response",
            }
        )
    return out


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 6),
    payload=st.binary(min_size=0, max_size=400),
)
def test_record_roundtrip_property(n, payload):
    recs = _recs(n) + [{"warc_type": "resource", "payload": payload}]
    for blob, parse in ((build_warc(recs), parse_warc),
                        (build_warc_gz(recs), parse_warc_gz)):
        back = parse(blob)
        assert len(back) == len(recs)
        assert back[-1].payload == payload
        assert [r.warc_type for r in back] == [r["warc_type"] for r in recs]


def test_gz_member_ranged_access():
    recs = _recs(4)
    gz = build_warc_gz(recs)
    ranges = warc_gz_member_ranges(gz)
    assert len(ranges) == 5 and sum(ln for _, ln in ranges) == len(gz)
    # one ranged read + decompress yields exactly that record
    off, ln = ranges[3]
    (r,) = parse_warc(gzip.decompress(gz[off : off + ln]))
    assert r.target_uri == "http://example.test/2"


def test_http_split_and_html_text():
    status, headers, body = split_http_response(
        http_response_payload(b"<p>a</p>", "text/html; charset=utf-8")
    )
    assert status == 200 and "text/html" in headers["content-type"]
    assert body == b"<p>a</p>"
    with pytest.raises(ValueError, match="HTTP"):
        split_http_response(b"FTP nope\r\n\r\n")
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><p>A &amp; B</p><script>x()</script><div>C</div></body></html>"
    )
    assert html_to_text(html) == "T\nA & B\nC"
    assert html_to_text("plain   text\twith\tspaces") == "plain text with spaces"


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 10), cut=st.floats(0.02, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    for builder, parser in ((build_warc, parse_warc), (build_warc_gz, parse_warc_gz)):
        data = bytearray(builder(_recs(2)))
        for _ in range(n_mut):
            data[rnd.randrange(len(data))] = rnd.randrange(256)
        blob = bytes(data)[: max(2, int(len(data) * cut))]
        try:
            parser(blob)
        except ValueError:
            pass


def test_spark_read_and_extract(spark, tmp_path):
    """End to end: plain + gz archives fan out, records parse map-side,
    response payloads split and extract to text."""
    recs = _recs(3)
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "b.warc.gz")
    with open(p1, "wb") as f:
        f.write(build_warc(recs))
    with open(p2, "wb") as f:
        f.write(build_warc_gz(recs))
    df = read_warc(spark, [p1, p2], parallelism=2)
    rows = df.collect()
    assert len(rows) == 8  # (1 warcinfo + 3 responses) × 2 archives
    assert {r.warc_type for r in rows} == {"warcinfo", "response"}
    assert all(r.http_status == 200 for r in rows if r.warc_type == "response")
    txt = warc_text_extract(df).collect()
    assert len(txt) == 6
    got = {(r.target_uri, r.text) for r in txt}
    assert ("http://example.test/1", "page 1") in got


# ---------------------------------------------------------------------------
# WebDataset tar shards (llm/webdataset.py)
# ---------------------------------------------------------------------------


def test_webdataset_shard_roundtrip_and_grouping():
    from hdp2_5_hive2_spark.llm.webdataset import build_shard, parse_shard

    samples = [
        ("000001", {"jpg": b"\xff\xd8fake", "txt": b"a cat", "json": b"{}"}),
        ("000002", {"txt": b"a dog", "seg.png": b"\x89PNGfake"}),
    ]
    blob = build_shard(samples)
    back = parse_shard(blob)
    assert back == samples
    # multi-dot extension groups under the first-dot key
    assert back[1][1]["seg.png"] == b"\x89PNGfake"
    # deterministic bytes
    assert build_shard(samples) == blob
    with pytest.raises(ValueError, match="shard corrupt"):
        parse_shard(b"not a tar at all" * 40)


def test_webdataset_spark_read_write(spark, tmp_path):
    """Export → re-read: md5-routed shards are stable, samples survive
    with grouped extensions, and every shard is written by its own task."""
    from hdp2_5_hive2_spark.llm.webdataset import read_webdataset, write_webdataset

    rows = []
    for i in range(40):
        rows.append((f"{i:06d}", "txt", bytes(f"text {i}", "ascii")))
        rows.append((f"{i:06d}", "cls", bytes([i % 7])))
    df = spark.createDataFrame(rows, "key string, ext string, payload binary")
    out = str(tmp_path / "shards")
    report = write_webdataset(df, out, n_shards=4).collect()
    assert sum(r.n_samples for r in report) == 40
    paths = sorted(r.shard_path for r in report)
    back = read_webdataset(spark, paths)
    got = {(r.key, r.ext): bytes(r.payload) for r in back.collect()}
    assert len(got) == 80
    assert got[("000007", "txt")] == b"text 7"
    assert got[("000007", "cls")] == bytes([0])
    # routing is deterministic: rewriting produces identical shard bytes
    out2 = str(tmp_path / "shards2")
    write_webdataset(df, out2, n_shards=4).collect()
    import os
    for p in paths:
        q = os.path.join(out2, os.path.basename(p))
        assert open(p, "rb").read() == open(q, "rb").read()
