"""Target classification + env options (S3-S5) — mirrors the reference's
args_parser matrix (spec/rika/cli/args_parser/*_spec.rb)."""

from __future__ import annotations

import os

from rika_ray.sources.targets import (
    classify_targets,
    expand_braces,
    expand_filespec,
    prepend_environment_args,
)


def test_brace_expansion():
    assert expand_braces("a.{txt,pdf}") == ["a.txt", "a.pdf"]
    assert expand_braces("{x,y}/{1,2}") == ["x/1", "x/2", "y/1", "y/2"]
    assert expand_braces("plain") == ["plain"]


def test_glob_expansion_skips_dirs(tmp_path):
    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "b.txt").write_text("y")
    (tmp_path / "sub").mkdir()
    got = expand_filespec(str(tmp_path / "*"))
    assert [os.path.basename(p) for p in got] == ["a.txt", "b.txt"]


def test_recursive_glob(tmp_path):
    (tmp_path / "d1").mkdir()
    (tmp_path / "d1" / "x.pdf").write_text("p")
    (tmp_path / "y.pdf").write_text("p")
    got = expand_filespec(str(tmp_path / "**" / "*.pdf"))
    assert len(got) == 2


def test_classification_taxonomy(tmp_path):
    ok = tmp_path / "ok.txt"
    ok.write_text("hello")
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    link = tmp_path / "link.txt"
    os.symlink(str(ok), str(link))
    weird = tmp_path / "que?ry.txt"
    weird.write_text("x")

    c = classify_targets(
        [
            str(ok),
            str(empty),
            str(link),
            str(weird),
            str(tmp_path / "missing.txt"),
            "https://example.com/page",
            "ftp://example.com/file",
            "http://",
        ]
    )
    assert c.targets == [str(ok), "https://example.com/page"]
    assert c.issues["empty_file"] == [str(empty)]
    assert c.issues["is_symlink_wont_process"] == [str(link)]
    assert c.issues["file_with_url_characters"] == [str(weird)]
    assert c.issues["non_existent_file"] == [str(tmp_path / "missing.txt")]
    assert c.issues["bad_url_scheme"] == ["ftp://example.com/file"]
    assert c.issues["invalid_url"] == ["http://"]
    assert c.bad_count == 6


def test_directories_silently_dropped(tmp_path):
    (tmp_path / "d").mkdir()
    c = classify_targets([str(tmp_path / "d")])
    assert c.targets == [] and c.bad_count == 0


def test_duplicate_targets_not_deduped(tmp_path):
    # reference footgun: a file matching multiple patterns is processed
    # multiple times (EXAMPLES.md:187-197)
    f = tmp_path / "doc.txt"
    f.write_text("x")
    c = classify_targets([str(f), str(tmp_path / "*.txt")])
    assert c.targets == [str(f), str(f)]


def test_env_args_prepended_cli_overrides(monkeypatch):
    monkeypatch.setenv("RIKA_RAY_OPTIONS", "-f yy --key-sort no")
    got = prepend_environment_args(["-f", "jj", "x.txt"])
    assert got == ["-f", "yy", "--key-sort", "no", "-f", "jj", "x.txt"]
    monkeypatch.delenv("RIKA_RAY_OPTIONS")
    assert prepend_environment_args(["a"]) == ["a"]
