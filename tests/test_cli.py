"""CLI tests (SURVEY S1)."""

import json
import subprocess
import sys

TRANSFORM_SRC = """
from rayxt import Transformation, Rule, Ref
from rayxt.lib import append, remove_elements, extract_text_handler, put_variable

main = Transformation(
    Rule("script", append("trash", Ref("element"))),
    remove_elements("trash"),
    [extract_text_handler(), put_variable("text")],
    copy=False,
    result_object="context.text",
)
"""


def test_cli_transform_html(tmp_path):
    tf = tmp_path / "t.py"
    tf.write_text(TRANSFORM_SRC)
    doc = tmp_path / "d.html"
    doc.write_bytes(b"<html><body><script>x</script><p>hello</p></body></html>")
    out = subprocess.run(
        [sys.executable, "-m", "rayxt", "transform", str(tf), str(doc)],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    assert out.stdout.strip() == "hello"


def test_cli_transform_xml_roundtrip(tmp_path):
    tf = tmp_path / "t.py"
    tf.write_text(
        "from rayxt import Transformation\n"
        "main = Transformation(copy=False, result_object='context.root')\n"
    )
    doc = tmp_path / "d.xml"
    doc.write_bytes(b'<?xml version="1.0"?><m:r xmlns:m="urn:m"><m:k>v</m:k></m:r>')
    out = subprocess.run(
        [sys.executable, "-m", "rayxt", "transform", str(tf), str(doc)],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    assert out.stdout.strip() == (
        '<ns0:r xmlns:ns0="urn:m"><ns0:k>v</ns0:k></ns0:r>'
    )


def test_cli_pipeline_with_dsl_program_file(tmp_path):
    """`rayxt pipeline --program x.json` runs the declarative program
    end-to-end (read -> actor extract -> partitioned sink) in its own
    Ray session."""
    from fixtures.gen_pages import ensure_pages_parquet

    inp = str(tmp_path / "pages.parquet")
    ensure_pages_parquet(inp, 80, giant_cap=65536)
    out_dir = str(tmp_path / "out")
    run = subprocess.run(
        [sys.executable, "-m", "rayxt", "pipeline",
         "--input", inp, "--output", out_dir,
         "--program", "rayxt/programs/main_content.json",
         "--partitions", "4", "--num-cpus", "2", "--batch-size", "32"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
        env={**__import__("os").environ, "RAY_ADDRESS": ""},
    )
    report = json.loads(run.stdout.strip().splitlines()[-1])
    assert report["rows_total"] == 80
    assert report["partitions_total"] == 4


def test_cli_transform_records_json(tmp_path):
    tf = tmp_path / "t.py"
    tf.write_text(
        "from rayxt.programs.wikipedia_table import wikitable_program\n"
        "main = wikitable_program()\n"
    )
    doc = tmp_path / "d.html"
    doc.write_bytes(
        b"<html><body><table class='wikitable'><tr><th>A</th></tr>"
        b"<tr><td>1</td></tr></table></body></html>"
    )
    out = subprocess.run(
        [sys.executable, "-m", "rayxt", "transform", str(tf), str(doc)],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    recs = json.loads(out.stdout)
    assert recs == [{"table_idx": 0, "row_idx": 0, "A": "1"}]
