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
