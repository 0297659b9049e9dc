"""CLI end-to-end (SURVEY.md §5.1 "Integration" layer analogue:
cli_end_to_end_spec.rb): stdout goldens, machine-readable round-trips,
empty-file continuation, exit codes."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
import yaml

REPO = "/root/repo"


def _run_cli(args: list[str], cwd: str = REPO, env_extra: dict | None = None):
    import os

    env = dict(os.environ, PYTHONPATH=REPO)
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-m", "rika_ray.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd,
        timeout=300,
    )


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clidocs")
    (d / "one.txt").write_text("The quick brown fox jumps over the lazy dog "
                               "and keeps on running through the field.\n")
    (d / "two.txt").write_text("Second document with its own words inside.\n")
    (d / "empty.txt").write_text("")
    return d


def test_no_targets_exit_zero():
    res = _run_cli([])
    assert res.returncode == 0


def test_dry_run(doc_dir):
    res = _run_cli(["--dry-run", str(doc_dir / "one.txt")])
    assert res.returncode == 0
    assert "target:" in res.stdout and "one.txt" in res.stdout


def test_stream_json_output(doc_dir):
    res = _run_cli(["-f", "jj", str(doc_dir / "one.txt")])
    assert res.returncode == 0, res.stderr[-500:]
    parsed = json.loads(res.stdout.strip())
    assert "quick brown fox" in parsed["text"]
    assert parsed["metadata"]["Content-Type"].startswith("text/plain")
    assert parsed["metadata"]["rika:language"] == "en"


def test_array_yaml_output(doc_dir):
    res = _run_cli(
        ["-f", "yy", "-a", str(doc_dir / "one.txt"), str(doc_dir / "two.txt")]
    )
    assert res.returncode == 0, res.stderr[-500:]
    parsed = yaml.safe_load(res.stdout)
    assert len(parsed) == 2


def test_empty_file_continuation_and_exit_code(doc_dir):
    # empty file is reported, good file still processed, exit 1
    res = _run_cli(["-f", "jj", str(doc_dir / "one.txt"), str(doc_dir / "empty.txt")])
    assert res.returncode == 1
    assert "empty_file" in res.stderr
    assert "quick brown fox" in res.stdout


def test_bad_format_exit_2(doc_dir):
    res = _run_cli(["-f", "zz", str(doc_dir / "one.txt")])
    assert res.returncode == 2
    assert "invalid format" in res.stderr


def test_env_options_layering(doc_dir):
    res = _run_cli(
        [str(doc_dir / "one.txt")], env_extra={"RIKA_RAY_OPTIONS": "-f jj"}
    )
    assert res.returncode == 0
    json.loads(res.stdout.strip())  # env made it machine-readable


def test_max_content_length(doc_dir):
    res = _run_cli(["-f", "jj", "-l", "9", str(doc_dir / "one.txt")])
    assert res.returncode == 0
    assert json.loads(res.stdout.strip())["text"] == "The quick"


def test_warc_target_routes_through_warc_reader(tmp_path):
    from rika_ray import docgen

    warc = tmp_path / "crawl-seg.warc.gz"
    warc.write_bytes(
        docgen.build_warc(
            [
                (
                    "https://crawl.test/page-one",
                    "2026-01-02T00:00:00Z",
                    b"warc record body text, long enough to be a document.\n",
                    "text/plain",
                ),
                (
                    "https://crawl.test/page-two",
                    "2026-01-02T00:00:01Z",
                    b"second crawl record body.\n",
                    "text/plain",
                ),
            ],
            gzip_members=True,
        )
    )
    res = _run_cli(["-f", "jj", "-a", str(warc)])
    assert res.returncode == 0, res.stderr[-800:]
    docs = json.loads(res.stdout)
    # one crawl file → one document per WARC response record
    assert {d["source"] for d in docs} == {
        "https://crawl.test/page-one",
        "https://crawl.test/page-two",
    }
    assert any("warc record body" in d["text"] for d in docs)


def test_textual_web_formats_through_cli(tmp_path):
    """CSV (name hint on a short table), Markdown and SVG files extract
    through the loose-file CLI path with their refined media types."""
    (tmp_path / "t.csv").write_text("id,name\n1,alpha\n")
    (tmp_path / "n.md").write_text(
        "# My Title\n\nSome body text here.\n\n## More\n\n- item one\n"
    )
    (tmp_path / "pic.svg").write_text(
        '<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/2000/svg">'
        "<title>Diagram</title><text>Label text</text></svg>\n"
    )
    res = _run_cli(
        ["-f", "jj",
         str(tmp_path / "t.csv"), str(tmp_path / "n.md"),
         str(tmp_path / "pic.svg")]
    )
    assert res.returncode == 0, res.stderr[-500:]
    rows = [json.loads(ln) for ln in res.stdout.strip().splitlines()]
    by_type = {
        r["metadata"]["Content-Type"].split(";")[0]: r for r in rows
    }
    assert set(by_type) == {"text/csv", "text/markdown", "image/svg+xml"}
    assert by_type["text/csv"]["text"] == "id,name\n1,alpha\n"
    md = by_type["text/markdown"]
    assert "My Title" in md["text"] and "# " not in md["text"]
    assert md["metadata"]["dc:title"] == "My Title"
    svg = by_type["image/svg+xml"]
    assert svg["text"] == "Diagram\nLabel text\n"


def test_wet_target_routes_through_warc_reader(tmp_path):
    """Common Crawl *.warc.wet.gz files (conversion records) route through
    the WARC reader and extract as plain text."""
    import gzip

    body = ("Extracted page text with enough words to be a normal "
            "document for the pipeline.\n").encode()
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://example.test/wetpage\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}".encode()
        + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    p = tmp_path / "seg-00001.warc.wet.gz"
    p.write_bytes(gzip.compress(rec, mtime=0))
    res = _run_cli(["-f", "jj", str(p)])
    assert res.returncode == 0, res.stderr[-500:]
    rows = [json.loads(ln) for ln in res.stdout.strip().splitlines()]
    assert len(rows) == 1
    assert rows[0]["metadata"]["rika:data-source"] == "https://example.test/wetpage"
    assert "Extracted page text" in rows[0]["text"]
