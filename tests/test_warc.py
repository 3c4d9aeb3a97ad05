"""WARC source tests: spec-true writer/reader round trips, the
Common-Crawl per-record-gzip layout, record filtering, and the
end-to-end feed into the extraction pipeline."""

import gzip
import io

import pyarrow.parquet as pq
import pytest

from fixtures.gen_pages import ensure_pages_parquet
from rayxt.warc import parse_warc_records, read_warc, write_warc


@pytest.fixture(scope="module")
def pages_rows(tmp_path_factory):
    path = ensure_pages_parquet(
        str(tmp_path_factory.mktemp("warc") / "pages.parquet"), 300,
        giant_cap=262144)
    return pq.read_table(
        path, columns=["url", "warc_ts", "html"]).to_pylist()


def test_warc_roundtrip_both_layouts(ray_session, pages_rows, tmp_path):
    a = write_warc(pages_rows[:120], str(tmp_path / "a.warc"))
    b = write_warc(pages_rows[120:], str(tmp_path / "b.warc.gz"))
    df = (read_warc([a, b]).to_pandas()
          .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    import pandas as pd

    want = (pd.DataFrame(pages_rows)
            .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    assert len(df) == len(want)
    assert (df["url"] == want["url"]).all()
    assert all(x == y for x, y in zip(df["html"], want["html"]))
    assert (pd.to_datetime(df["warc_ts"])
            == pd.to_datetime(want["warc_ts"])).all()
    assert df["lang"].isna().all()
    # the gz layout really is per-record gzip members (CC layout)
    raw = open(b, "rb").read()
    assert raw[:2] == b"\x1f\x8b"
    n_members = raw.count(b"\x1f\x8b\x08")
    assert n_members >= len(pages_rows) - 120  # 1 warcinfo + responses


def test_warc_record_parsing_edge_cases():
    # non-response records are skipped; bodies split at CRLF CRLF
    rec = (b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 4\r\n"
           b"\r\nabcd\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\n"
           b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
           b"Content-Length: 43\r\n\r\n"
           b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
    got = list(parse_warc_records(io.BufferedReader(
        io.BytesIO(rec))))
    assert len(got) == 1
    url, ts, body = got[0]
    assert url == "http://x/" and body == b"hello"
    assert ts.year == 2024 and ts.second == 5
    with pytest.raises(ValueError):
        list(parse_warc_records(io.BufferedReader(
            io.BytesIO(b"NOT A WARC\r\n\r\n"))))


def test_warc_zst_roundtrip(ray_session, pages_rows, tmp_path):
    """.warc.zst: concatenated per-record zstd frames (RFC 8878 magic),
    read back identical to the plain layout."""
    z = write_warc(pages_rows[:80], str(tmp_path / "z.warc.zst"))
    raw = open(z, "rb").read()
    assert raw[:4] == b"\x28\xb5\x2f\xfd"
    assert raw.count(b"\x28\xb5\x2f\xfd") >= 81  # warcinfo + 80 frames
    df = (read_warc([z]).to_pandas()
          .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    import pandas as pd

    want = (pd.DataFrame(pages_rows[:80])
            .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    assert len(df) == 80
    assert (df["url"] == want["url"]).all()
    assert all(x == y for x, y in zip(df["html"], want["html"]))


def test_warc_date_precision_and_tz(tmp_path):
    """Sub-second timestamps survive a write/parse round trip at
    microsecond precision (WARC/1.1); tz-aware datetimes normalize to
    UTC instead of emitting an invalid '+00:00Z' suffix."""
    from datetime import datetime, timedelta, timezone

    from rayxt.warc import parse_warc_records

    sub = datetime(2024, 5, 6, 7, 8, 9, 123456)
    aware = datetime(2024, 5, 6, 9, 8, 9, 500000,
                     tzinfo=timezone(timedelta(hours=2)))
    whole = datetime(2024, 5, 6, 7, 8, 9)
    rows = [{"url": f"http://x/{i}", "warc_ts": ts, "html": b"<p>a</p>"}
            for i, ts in enumerate([sub, aware, whole])]
    p = write_warc(rows, str(tmp_path / "ts.warc"))
    raw = open(p, "rb").read()
    assert b"WARC-Date: 2024-05-06T07:08:09.123456Z" in raw
    assert b"WARC-Date: 2024-05-06T07:08:09.500000Z" in raw  # UTC-shifted
    assert b"WARC-Date: 2024-05-06T07:08:09Z" in raw
    assert b"+00:00" not in raw
    # fractional dates ride a WARC/1.1 version line, whole seconds 1.0
    assert b"WARC/1.1\r\n" in raw and b"WARC/1.0\r\n" in raw
    got = {u: ts for u, ts, _ in
           parse_warc_records(io.BufferedReader(io.BytesIO(raw)))}
    assert got["http://x/0"] == sub
    assert got["http://x/1"] == datetime(2024, 5, 6, 7, 8, 9, 500000)
    assert got["http://x/2"] == whole


def test_warc_dechunk():
    """dechunk=True re-assembles Transfer-Encoding: chunked bodies;
    default leaves raw capture bytes; malformed framing passes through."""
    chunked = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + chunked)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://c/\r\n"
           b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           + http + b"\r\n\r\n")

    def parse(blob, **kw):
        return list(parse_warc_records(
            io.BufferedReader(io.BytesIO(blob)), **kw))

    assert parse(rec)[0][2] == chunked
    assert parse(rec, dechunk=True)[0][2] == b"hello world"
    # declared chunked but body already decoded -> unchanged
    plain = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             b"just plain text")
    rec2 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://p/\r\n"
            b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
            b"Content-Length: " + str(len(plain)).encode() + b"\r\n\r\n"
            + plain + b"\r\n\r\n")
    assert parse(rec2, dechunk=True)[0][2] == b"just plain text"
    # a 'chunked' mention in an unrelated header never triggers decode
    other = (b"HTTP/1.1 200 OK\r\nX-Note: chunked\r\n\r\n5\r\nhello\r\n"
             b"0\r\n\r\n")
    rec3 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://n/\r\n"
            b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
            b"Content-Length: " + str(len(other)).encode() + b"\r\n\r\n"
            + other + b"\r\n\r\n")
    assert parse(rec3, dechunk=True)[0][2] == other.split(b"\r\n\r\n", 1)[1]


def test_warc_feeds_extraction(ray_session, pages_rows, tmp_path):
    """read_warc -> extract_pages equals the parquet-sourced extraction
    on the same rows (the source swap is transparent)."""
    import ray.data as rd

    from rayxt.pipeline import extract_pages

    w = write_warc(pages_rows[:100], str(tmp_path / "x.warc.gz"))
    from_warc = (extract_pages(read_warc([w]), concurrency=1)
                 .select_columns(["url", "text", "status"]).to_pandas()
                 .sort_values("url").reset_index(drop=True))
    src = rd.from_items([dict(r, lang=None) for r in pages_rows[:100]])
    from_rows = (extract_pages(src, concurrency=1)
                 .select_columns(["url", "text", "status"]).to_pandas()
                 .sort_values("url").reset_index(drop=True))
    assert from_warc.equals(from_rows)


def test_http_metadata_parse_policy():
    import io

    from rayxt.warc import _parse_http_head, parse_warc_records, write_warc

    assert _parse_http_head(b"HTTP/1.1 301 Moved\r\nContent-Type:  Text/HTML ; x=1 \r\n") \
        == (301, "text/html ; x=1")
    assert _parse_http_head(b"HTTP/1.1 abc\r\n") == (None, None)
    assert _parse_http_head(b"ICY 200 OK\r\nContent-Type: audio/mpeg\r\n") \
        == (None, "audio/mpeg")
    assert _parse_http_head(b"HTTP/1.0 404") == (404, None)


def test_read_warc_with_http_roundtrip(ray_session, tmp_path):
    from fixtures.gen_pages import generate_warc_http_table, stage_warc_http
    from rayxt.warc import read_warc

    paths = stage_warc_http(str(tmp_path / "wh"), 80)
    got = read_warc(paths, with_http=True).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    src = generate_warc_http_table(80).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(got["http_status"]) == list(src["status"])
    want_ct = [(c or "text/html").strip().lower()
               for c in src["content_type"]]
    assert list(got["content_type"]) == want_ct
    assert [bytes(b) for b in got["html"]] == \
        [bytes(b) for b in src["html"]]


def test_read_warc_without_http_schema_unchanged(ray_session, tmp_path):
    from fixtures.gen_pages import stage_warc_http
    from rayxt.warc import read_warc

    paths = stage_warc_http(str(tmp_path / "wh2"), 20)
    cols = read_warc(paths).to_pandas().columns.tolist()
    assert cols == ["url", "warc_ts", "html", "lang"]


def _resp_record(http: bytes, url: bytes = b"http://e/") -> bytes:
    return (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: " + url + b"\r\n"
            b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n")


def _parse_blob(blob, **kw):
    return list(parse_warc_records(
        io.BufferedReader(io.BytesIO(blob)), **kw))


def test_warc_decode_content():
    """decode_content=True undoes gzip/deflate Content-Encoding;
    unknown codings and lying headers pass bodies through unchanged;
    chunked undoes FIRST (wire order)."""
    import zlib

    content = b"<html><body>hello encoded world</body></html>"
    gz = gzip.compress(content, mtime=0)
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz)
    rec = _resp_record(http)
    assert _parse_blob(rec)[0][2] == gz                      # default raw
    assert _parse_blob(rec, decode_content=True)[0][2] == content

    for coding, enc in ((b"x-gzip", gz),
                        (b"deflate", zlib.compress(content)),
                        (b"deflate", zlib.compress(content)[2:-4])):
        http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: " + coding
                + b"\r\n\r\n" + enc)
        got = _parse_blob(_resp_record(http), decode_content=True)
        assert got[0][2] == content, coding

    # unknown coding (br) and a lying gzip header -> unchanged
    http = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n" + content
    assert _parse_blob(_resp_record(http),
                       decode_content=True)[0][2] == content
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            b"not actually gzip")
    assert _parse_blob(_resp_record(http),
                       decode_content=True)[0][2] == b"not actually gzip"

    # chunked + gzip: dechunk first, then decode
    chunked = (hex(len(gz[:10]))[2:].encode() + b"\r\n" + gz[:10]
               + b"\r\n" + hex(len(gz[10:]))[2:].encode() + b"\r\n"
               + gz[10:] + b"\r\n0\r\n\r\n")
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + chunked)
    got = _parse_blob(_resp_record(http), dechunk=True,
                      decode_content=True)
    assert got[0][2] == content


def test_warc_writer_content_encoding_round_trip(ray_session, tmp_path):
    """write_warc(content_encoding=...) stages compressed-response
    captures; read_warc(decode_content=True) restores the logical
    bodies, the default read returns wire bytes."""
    from rayxt.warc import read_warc

    from datetime import datetime as _dt

    rows = [
        {"url": "http://e/plain", "warc_ts": _dt(2026, 3, 1),
         "html": b"<p>plain</p>"},
        {"url": "http://e/gz", "warc_ts": _dt(2026, 3, 1, 1),
         "html": b"<p>gzipped body</p>", "content_encoding": "gzip"},
        {"url": "http://e/df", "warc_ts": _dt(2026, 3, 1, 2),
         "html": b"<p>deflated body</p>", "content_encoding": "deflate"},
        {"url": "http://e/br", "warc_ts": _dt(2026, 3, 1, 3),
         "html": b"raw-but-declared", "content_encoding": "br"},
    ]
    path = str(tmp_path / "enc.warc.gz")
    write_warc(rows, path)
    dec = {r["url"]: bytes(r["html"])
           for r in read_warc([path], decode_content=True)
           .to_pandas().to_dict("records")}
    assert dec["http://e/plain"] == b"<p>plain</p>"
    assert dec["http://e/gz"] == b"<p>gzipped body</p>"
    assert dec["http://e/df"] == b"<p>deflated body</p>"
    assert dec["http://e/br"] == b"raw-but-declared"  # undecodable
    raw = {r["url"]: bytes(r["html"])
           for r in read_warc([path]).to_pandas().to_dict("records")}
    assert raw["http://e/gz"] != b"<p>gzipped body</p>"
    assert raw["http://e/gz"].startswith(b"\x1f\x8b")
