"""Unicode script profiling: policy cases, engine-vs-oracle parity,
dataset stage."""

import pyarrow as pa
import pytest

from rayxt.script_id import add_script_profile, script_profile
from tests.oracle.script_oracle import oracle_script_profile


@pytest.mark.parametrize("text,want", [
    ("hello world", ("latin", 1.0, 10)),
    ("привет мир", ("cyrillic", 1.0, 9)),
    ("你好世界", ("han", 1.0, 4)),
    ("hello мир", ("latin", round(5 / 8, 6), 8)),
    ("12345 !?.", (None, 0.0, 0)),
    ("", (None, 0.0, 0)),
    (None, (None, 0.0, 0)),
    ("ab яю", ("cyrillic", 0.5, 4)),      # 2-2 tie: smaller name wins
    ("こん漢字", ("han", 0.5, 4)),         # kana-han tie -> han
    ("안녕 ab", ("hangul", 0.5, 4)),
])
def test_policy(text, want):
    assert script_profile(text) == want
    assert oracle_script_profile(text) == want


def test_engine_matches_oracle_on_fixture_family():
    from fixtures.gen_pages import script_text_of

    for i in range(800):
        t = script_text_of(i)
        assert script_profile(t) == oracle_script_profile(t), i


def test_dataset_stage(ray_session):
    import ray.data as rd

    from fixtures.gen_pages import generate_script_table

    src = generate_script_table(200)
    out = add_script_profile(rd.from_arrow(src)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "text", "dominant_script",
                                 "script_ratio", "n_script_chars"]
    for i in range(200):
        d, r, n = oracle_script_profile(src["text"][i].as_py())
        got_d = out["dominant_script"][i]
        assert (got_d if isinstance(got_d, str) else None) == d
        assert out["script_ratio"][i] == r
        assert out["n_script_chars"][i] == n
