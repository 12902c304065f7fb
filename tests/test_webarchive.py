"""WARC source + JSONL shard sink: synthesize archives on disk, read
them through the distributed path, round-trip the export."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.sinks.jsonl import read_jsonl, write_jsonl_shards
from ndvi_etl_pipeline_spark.sources.webarchive import (
    parse_warc_bytes,
    read_warc,
    warc_documents,
)


def _warc_record(
    rec_type: str,
    uri: str,
    payload: bytes,
    content_type: str = "text/html",
    date: str = "2026-08-14T00:00:00Z",
) -> bytes:
    head = (
        f"WARC/1.1\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http_payload(body: str, inner_ct: str | None = "text/html") -> bytes:
    ct = f"Content-Type: {inner_ct}\r\n" if inner_ct else ""
    return (b"HTTP/1.1 200 OK\r\n" + ct.encode() + b"\r\n") + body.encode()


# Spec-compliant record-level type of an HTTP response record
# (WARC/1.1 §6.3): the payload MIME type lives in the HTTP headers.
_HTTP_RESPONSE_CT = "application/http; msgtype=response"


def _build_warc(n: int, start: int = 0) -> bytes:
    out = [
        _warc_record(
            "warcinfo", "none", b"software: test\r\n", content_type="application/warc-fields"
        )
    ]
    for i in range(start, start + n):
        out.append(
            _warc_record(
                "response",
                f"https://example.org/page{i}",
                _http_payload(f"doc body number {i} with words"),
                content_type=_HTTP_RESPONSE_CT,
            )
        )
    return b"".join(out)


def test_parse_warc_bytes_plain_and_gzip():
    raw = _build_warc(3)
    recs = parse_warc_bytes(raw, "f")
    assert len(recs) == 4  # warcinfo + 3 responses
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[2]["target_uri"] == "https://example.org/page1"
    assert recs[2]["payload"].endswith(b"number 1 with words")

    # member-gzip (one member per record, the standard layout)
    member_gz = b"".join(
        gzip.compress(_warc_record("response", f"u{i}", _http_payload(f"b{i}")))
        for i in range(2)
    )
    recs = parse_warc_bytes(member_gz, "g")
    assert [r["target_uri"] for r in recs] == ["u0", "u1"]


def test_parse_warc_truncated_tail_quarantines():
    raw = _build_warc(2) + b"WARC/1.1\r\nContent-Length: 999\r\n\r\nshort"
    recs = parse_warc_bytes(raw, "f")
    assert len(recs) == 3  # truncated final record dropped, no raise


def test_read_warc_distributed_and_documents(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_build_warc(5))
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_build_warc(4, start=100)))

    records = read_warc(spark, str(tmp_path) + "/*")
    assert records.count() == 11  # 2 warcinfo + 9 responses

    docs = warc_documents(records)
    rows = docs.orderBy("url").collect()
    assert len(rows) == 9
    assert rows[0]["text"] == "doc body number 0 with words"  # HTTP headers stripped
    assert rows[0]["n_chars"] == len(rows[0]["text"])
    # doc ids deterministic across re-reads (idempotent re-ingestion)
    again = warc_documents(read_warc(spark, str(tmp_path) + "/*"))
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again.collect()
    )

    # inner-Content-Type screen on the HTTP envelope: binary payloads
    # drop, header-less payloads keep (like NULL record types)
    extra = b"".join(
        [
            _warc_record(
                "response", "https://example.org/img",
                _http_payload("PNGBYTES", inner_ct="image/png"),
                content_type=_HTTP_RESPONSE_CT,
            ),
            _warc_record(
                "response", "https://example.org/noct",
                _http_payload("bare body", inner_ct=None),
                content_type=_HTTP_RESPONSE_CT,
            ),
        ]
    )
    (tmp_path / "c.warc").write_bytes(extra)
    docs2 = warc_documents(read_warc(spark, str(tmp_path) + "/c.warc"))
    kept = {r["url"]: r["text"] for r in docs2.collect()}
    assert kept == {"https://example.org/noct": "bare body"}


def test_jsonl_shard_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = str(tmp_path / "shards")
    shards = write_jsonl_shards(docs, out, "doc_id", target_records_per_shard=16)
    assert shards == -(-n // 16)

    back = read_jsonl(spark, out)
    assert back.count() == n
    # value-faithful: same (doc_id, n_chars) multiset
    a = sorted(docs.select("doc_id", "n_chars").collect())
    b = sorted(back.select("doc_id", "n_chars").collect())
    assert a == b

    # hive layout: one dir per non-empty shard, exactly one gzip file each
    expected_nonempty = (
        docs.select(F.pmod(F.xxhash64("doc_id"), F.lit(shards)).alias("s"))
        .distinct()
        .count()
    )
    dirs = [p for p in (tmp_path / "shards").iterdir() if p.name.startswith("shard=")]
    assert len(dirs) == expected_nonempty
    for d in dirs:
        files = [p for p in d.iterdir() if p.name.startswith("part-")]
        assert len(files) == 1 and files[0].name.endswith(".gz")

    # every line is standalone JSON (the training-consumer contract)
    first_file = next(
        p for p in sorted(dirs)[0].iterdir() if p.name.startswith("part-")
    )
    with gzip.open(first_file, "rt") as fh:
        first = json.loads(fh.readline())
    assert "doc_id" in first and "text" in first


def test_corrupt_jsonl_quarantine(spark, tmp_path):
    """Messy-corpus ingestion: PERMISSIVE JSON read routes unparseable
    lines into a corrupt-record column instead of failing the job —
    the quarantine-not-raise rule (SURVEY §2.10 E1/E4) applied to the
    training-data landing zone."""
    from pyspark.sql import types as T

    p = tmp_path / "landing.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good one"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also fine"}\n'
        '{"doc_id": "NaN-ish", "text": 3}\n'  # wrong types, still JSON
        '{"doc_id": 4, "text": "ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # required: corrupt-record queries need the raw line retained
    )
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = df.filter(F.col("_corrupt_record").isNotNull())
    assert clean.count() == 3
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 4]
    bad = [r["_corrupt_record"] for r in quarantine.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)
    df.unpersist()


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _records(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    recs = []
    for i in range(n):
        payload = draw(st.binary(min_size=0, max_size=300))
        uri = f"https://h/{draw(st.integers(0, 10**6))}-{i}"
        recs.append((uri, payload))
    return recs


@given(_records(), st.booleans())
@settings(max_examples=50, deadline=None)
def test_warc_codec_roundtrip_property(recs, use_gzip):
    """Build → parse round-trip: every record's uri/payload/length
    survives, in order, for arbitrary binary payloads (including
    payloads that themselves contain 'WARC/' or CRLF runs — the
    Content-Length framing, not sentinel scanning, must delimit
    records), plain and member-gzipped."""
    raw = b"".join(
        _warc_record("response", uri, payload) for uri, payload in recs
    )
    if use_gzip:
        raw = b"".join(
            gzip.compress(_warc_record("response", uri, payload))
            for uri, payload in recs
        )
    out = parse_warc_bytes(raw, "prop")
    assert [(r["target_uri"], r["payload"]) for r in out] == recs
    assert all(r["content_length"] == len(r["payload"]) for r in out)
    assert [r["record_idx"] for r in out] == list(range(len(recs)))


def test_warc_records_udtf_matches_mapinpandas_reader(spark, tmp_path):
    """The UDTF surface must produce the same records as read_warc on
    the same file (same parser either way)."""
    from ndvi_etl_pipeline_spark.functions.udtfs import register_udtfs
    from ndvi_etl_pipeline_spark.sources.webarchive import read_warc

    body1, body2 = b"hello world", b'{"k": 1}'
    raw = b"".join(
        b"WARC/1.1\r\nWARC-Type: resource\r\nWARC-Target-URI: urn:t:%d\r\n"
        b"Content-Length: %d\r\n\r\n%s\r\n\r\n" % (i, len(b), b)
        for i, b in enumerate([body1, body2])
    )
    p = tmp_path / "t.warc"
    p.write_bytes(raw)

    register_udtfs(spark)
    spark.read.format("binaryFile").load(str(p)).select(
        "path", "content"
    ).createOrReplaceTempView("_warc_files")
    got = spark.sql(
        "SELECT r.* FROM _warc_files f, LATERAL warc_records(f.content, f.path) r"
    ).collect()
    want = read_warc(spark, str(p)).collect()
    assert len(got) == len(want) == 2
    by_idx_g = {r.record_idx: r for r in got}
    by_idx_w = {r.record_idx: r for r in want}
    for i in (0, 1):
        assert bytes(by_idx_g[i].payload) == bytes(by_idx_w[i].payload)
        assert by_idx_g[i].target_uri == by_idx_w[i].target_uri == f"urn:t:{i}"
        assert by_idx_g[i].content_length == by_idx_w[i].content_length


def test_warc_datasource_matches_mapinpandas_reader(spark, tmp_path):
    """spark.read.format('warc') must yield the same records as
    read_warc (one parser, three surfaces), including through a
    multi-member gzip file."""
    import gzip

    from ndvi_etl_pipeline_spark.sources import warc_datasource
    from ndvi_etl_pipeline_spark.sources.webarchive import read_warc

    def rec(i: int, body: bytes) -> bytes:
        return (
            b"WARC/1.1\r\nWARC-Type: resource\r\nWARC-Target-URI: urn:d:%d\r\n"
            b"Content-Length: %d\r\n\r\n%s\r\n\r\n" % (i, len(body), body)
        )

    (tmp_path / "a.warc").write_bytes(rec(0, b"plain one") + rec(1, b"plain two"))
    # standard layout: one gzip member per record, concatenated
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(rec(2, b"gz one")) + gzip.compress(rec(3, b"gz two"))
    )

    warc_datasource.register(spark)
    got = spark.read.format("warc").load(str(tmp_path)).collect()
    want = read_warc(spark, str(tmp_path / "*.warc*")).collect()

    def key(r):
        return (r.target_uri, r.record_idx, bytes(r.payload), r.content_length)

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 4
    assert {r.target_uri for r in got} == {f"urn:d:{i}" for i in range(4)}
