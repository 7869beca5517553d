"""WARC source (sources/warc.py): writer/reader roundtrip through the
binaryFile + Arrow record-walk stage, member-stream failure isolation,
and non-response record passthrough."""

from __future__ import annotations

import hashlib

from tests.conftest import *  # noqa: F401,F403 — spark fixture


def _mk(records_per_file: int, n_files: int, tmp_path):
    from scraping_jobsdb_spark.sources.warc import (
        warc_gz_file,
        warc_response_record,
    )

    truth = {}
    for fi in range(n_files):
        recs = []
        for ri in range(records_per_file):
            i = fi * records_per_file + ri
            body = f"<html>doc {i} {'y' * (i % 17)}</html>".encode()
            url = f"http://t.example/doc/{i}"
            status = [200, 404, 500][i % 3]
            recs.append(warc_response_record(url, body, status=status))
            truth[url] = (status, len(body), hashlib.sha256(body).hexdigest()[:16])
        (tmp_path / f"f{fi:03d}.warc.gz").write_bytes(warc_gz_file(recs))
    return truth


def test_warc_read_roundtrip_multifile(spark, tmp_path):
    from scraping_jobsdb_spark.sources.warc import read_warc

    truth = _mk(records_per_file=25, n_files=4, tmp_path=tmp_path)
    got = {
        r.url: (r.http_status, r.n_bytes, hashlib.sha256(bytes(r.body)).hexdigest()[:16])
        for r in read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    }
    assert got == truth
    # parallelism = file count: binaryFile gives one row (task unit) per archive
    assert read_warc(spark, str(tmp_path / "*.warc.gz")).select("path").distinct().count() == 4


def test_warc_corrupt_file_isolated(spark, tmp_path):
    """A file whose member stream goes bad mid-way keeps its leading
    records and never fails the task; sibling files are untouched."""
    from scraping_jobsdb_spark.sources.warc import (
        read_warc,
        warc_gz_file,
        warc_response_record,
    )

    good = warc_response_record("http://t.example/ok", b"fine", status=200)
    tail = warc_response_record("http://t.example/lost", b"gone", status=200)
    (tmp_path / "a.warc.gz").write_bytes(
        warc_gz_file([good]) + b"\x1f\x8b-corrupt-member" + warc_gz_file([tail])
    )
    other = warc_response_record("http://t.example/other", b"ok2", status=301)
    (tmp_path / "b.warc.gz").write_bytes(warc_gz_file([other]))
    got = {r.url: r.http_status for r in read_warc(spark, str(tmp_path / "*.warc.gz")).collect()}
    assert got == {"http://t.example/ok": 200, "http://t.example/other": 301}


def test_warc_malformed_record_isolated_within_file():
    """A record whose WARC header block holds non-UTF-8 bytes (raises in
    the header decode) is skipped; the SAME file's other records — before
    AND after it — still parse (per-record isolation, not per-file)."""
    from scraping_jobsdb_spark.sources.warc import (
        parse_warc_members,
        warc_gz_file,
        warc_response_record,
    )

    before = warc_response_record("http://t.example/before", b"b1")
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://t.example/\xff\xfe-latin\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    after = warc_response_record("http://t.example/after", b"a1")
    blob = warc_gz_file([before, bad, after])
    urls = [r[0] for r in parse_warc_members(blob)]
    assert urls == ["http://t.example/before", "http://t.example/after"]


def test_warc_warcinfo_passthrough_and_plain_mode(spark, tmp_path):
    from scraping_jobsdb_spark.sources.warc import (
        read_warc,
        warc_response_record,
    )

    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 5\r\n"
        b"\r\nhello\r\n\r\n"
    )
    resp = warc_response_record("http://t.example/x", b"body!", status=200)
    (tmp_path / "c.warc").write_bytes(info + resp)  # UNcompressed archive
    rows = {
        r.warc_type: r
        for r in read_warc(spark, str(tmp_path / "*.warc"), gzipped=False).collect()
    }
    assert rows["warcinfo"].http_status == 0
    assert rows["response"].n_bytes == 5 and bytes(rows["response"].body) == b"body!"
