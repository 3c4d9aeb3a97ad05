"""Registered-domain extraction: explicit edge expectations, full
fixture-family engine==oracle parity, and the Dataset stage."""

import pytest

from fixtures.gen_pages import HOST_EDGE_CASES, generate_host_table
from rayxt.psl import registered_domain
from tests.oracle.psl_oracle import oracle_registered_domain

EXPECT = {
    "com": None,
    "co.uk": None,
    "foo.ck": None,                      # *.ck makes it a suffix
    "bar.foo.ck": "bar.foo.ck",
    "www.ck": "www.ck",                  # the !www.ck exception
    "x.www.ck": "www.ck",
    "192.168.0.1": "192.168.0.1",
    "256.1.1.1": "1.1",                  # not IPv4; implicit * rule
    "1.2.3.4.": "1.2.3.4",
    "a..com": None,
    ".com": None,
    "": None,
    "localhost": None,
    "xn--bcher-kva.de": "xn--bcher-kva.de",
    "s3.amazonaws.com": None,
    "b.s3.amazonaws.com": "b.s3.amazonaws.com",
    "WWW.Example.CO.UK": "example.co.uk",
    "cdn.static.x.github.io": "x.github.io",
    "blogspot.com": None,                # IS the suffix
    "a.blogspot.com": "a.blogspot.com",  # suffix + 1 = registrable
    "b.a.blogspot.com": "a.blogspot.com",
    "deep.a.b.site.example": "site.example",
}


@pytest.mark.parametrize("host", sorted(EXPECT, key=repr))
def test_edge_expectations(host):
    want = EXPECT[host]
    assert registered_domain(host) == want, host
    assert oracle_registered_domain(host) == want, host


def test_all_edge_cases_covered():
    for h in HOST_EDGE_CASES:
        assert registered_domain(h) == oracle_registered_domain(h), h


def test_family_parity():
    for h in generate_host_table(400)["host"].to_pylist():
        assert registered_domain(h) == oracle_registered_domain(h), h


def test_dataset_stage(ray_session):
    import ray.data as rd

    from rayxt.psl import add_registered_domain

    t = generate_host_table(100)
    got = add_registered_domain(
        rd.from_arrow(t).repartition(3)).to_pandas()
    by = dict(zip(got["host_id"], got["domain"]))
    for hid, h in zip(t["host_id"].to_pylist(),
                      t["host"].to_pylist()):
        want = oracle_registered_domain(h)
        v = by[hid]
        assert (None if v is None or v != v else v) == want, h
