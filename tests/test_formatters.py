"""Formatter registry + projection (S7/S8, M12) — mirrors
spec/rika/formatters_spec.rb and the merged-hash rule."""

from __future__ import annotations

import json

import pytest
import yaml

from rika_ray.formatters import (
    FORMATTERS,
    format_result_array,
    format_single_document,
    get_formatter,
    normalize_format_chars,
    result_hash,
)

ROW = {
    "url": "https://x.test/d1",
    "data_source": "https://x.test/d1",
    "content": "Hello world",
    "metadata": [
        {"key": "Content-Type", "value": "text/plain; charset=UTF-8"},
        {"key": "rika:language", "value": "en"},
    ],
    "error_type": None,
}


def test_registry_has_six_formats():
    assert sorted(FORMATTERS) == ["J", "a", "i", "j", "t", "y"]


def test_unknown_code_raises():
    with pytest.raises(KeyError):
        get_formatter("z")


def test_normalize():
    assert normalize_format_chars("j") == "jj"
    assert normalize_format_chars("at") == "at"
    assert normalize_format_chars("aty") == "at"  # truncate to 2
    with pytest.raises(ValueError):
        normalize_format_chars("zz")
    with pytest.raises(ValueError):
        normalize_format_chars("")


def test_result_hash_projection():
    h = result_hash(ROW)
    assert h == {
        "source": "https://x.test/d1",
        "metadata": {
            "Content-Type": "text/plain; charset=UTF-8",
            "rika:language": "en",
        },
        "text": "Hello world",
    }
    assert result_hash(ROW, include_text=False).keys() == {"source", "metadata"}
    assert result_hash(ROW, include_source=False, include_metadata=False) == {
        "text": "Hello world"
    }


def test_merged_json_round_trip():
    out = format_single_document(ROW, "jj")
    parsed = json.loads(out)
    assert parsed["text"] == "Hello world"
    assert parsed["metadata"]["rika:language"] == "en"


def test_merged_yaml_round_trip():
    out = format_single_document(ROW, "yy")
    parsed = yaml.safe_load(out)
    assert parsed["source"] == "https://x.test/d1"


def test_sectioned_output():
    out = format_single_document(ROW, "jt")
    lines = out.split("\n")
    assert lines[0] == "-- Source: https://x.test/d1"
    assert json.loads(lines[1])["rika:language"] == "en"
    assert lines[2] == "Hello world"


def test_array_sink():
    rows = [ROW, dict(ROW, content="Second", url="https://x.test/d2")]
    out = format_result_array(rows, "JJ")
    parsed = json.loads(out)
    assert len(parsed) == 2 and parsed[1]["text"] == "Second"
