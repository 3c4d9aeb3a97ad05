"""Property-based robustness tests (hypothesis).

The kernel's contract at 100 TB: NO input bytes may raise — every
failure mode becomes a status.  The parser and text policies must also
be deterministic and idempotent-ish under re-serialization.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from rayxt.dom import decode_html, extract_text, parse_html, serialize
from rayxt.kernel import extract_one
from rayxt.programs import get_program_factory

_PROGRAM = get_program_factory("main_content")()


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_kernel_never_raises_on_bytes(data):
    r = extract_one(data, _PROGRAM)
    assert r["status"] in ("ok", "empty", "error", "too_large")
    assert isinstance(r["text"], str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=1024))
def test_parse_html_total_on_text(text):
    root = parse_html(text.encode("utf-8", "replace"))
    assert root.tag == "html"
    extract_text(root)  # must not raise


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1024))
def test_decode_html_deterministic(data):
    assert decode_html(data) == decode_html(data)
    text, enc = decode_html(data)
    assert "\r" not in text


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400))
def test_text_extraction_stable_under_reserialize(text):
    """Parsing the serialization of a parse yields the same extracted
    text (the frozen policy is a fixed point after one round trip)."""
    root = parse_html(text.encode("utf-8"))
    once = extract_text(root)
    again = extract_text(parse_html(serialize(root).encode("utf-8")))
    assert once == again


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_kernel_deterministic(data):
    a = extract_one(data, _PROGRAM)
    b = extract_one(data, _PROGRAM)
    assert a == b


@settings(max_examples=40, deadline=None)
@given(st.integers(8, 28), st.integers(8, 28), st.integers(0, 2 ** 31),
       st.booleans())
def test_progressive_jpeg_matches_baseline_property(w, h, seed, split):
    """For ANY image, the progressive stream must decode bit-identically
    to the baseline stream (identical quantized coefficients), and the
    independent oracle must agree on the progressive bytes."""
    import numpy as np

    from fixtures.gen_media import _jpeg_encode, _jpeg_encode_progressive
    from rayxt.multimodal import _decode_jpeg_array
    from tests.oracle.jpeg_oracle import oracle_decode_jpeg

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = _decode_jpeg_array(_jpeg_encode(src, 85))
    prog_bytes = _jpeg_encode_progressive(src, 85, dc_split=split)
    prog = _decode_jpeg_array(prog_bytes)
    assert prog.shape == base.shape and (prog == base).all()
    assert (oracle_decode_jpeg(prog_bytes) == prog).all()
