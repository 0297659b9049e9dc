"""Formatter registry (operator S8, SURVEY.md §2.1).

The reference exposes six single-char serialization formats chosen
per-section (metadata format, text format) with a fixed lookup table that
raises KeyError on unknown codes (``/root/reference/lib/rika/formatters.rb:
10-37``):

    a  AwesomePrint (human pretty)   → pprint.pformat here
    i  inspect                        → repr
    j  JSON (compact)
    J  JSON (pretty)
    t  to_s (plain string)
    y  YAML

Format postprocessing mirrors ``args_parser.rb:118-133``: a single char is
duplicated ("j" → "jj"), longer strings truncate to 2 chars, invalid chars
raise. When both halves are the same machine-readable code (jj/JJ/yy) the
output is ONE merged hash of the whole result instead of separate
banner/metadata/text sections (``rika_command.rb:167-180``).
"""

from __future__ import annotations

import json
import pprint
from collections.abc import Callable

import yaml

VALID_CHARS = "aijJty"


def _to_yaml(obj) -> str:
    return yaml.safe_dump(obj, allow_unicode=True, sort_keys=False)


FORMATTERS: dict[str, Callable[[object], str]] = {
    "a": lambda o: pprint.pformat(o, sort_dicts=False),
    "i": repr,
    "j": lambda o: json.dumps(o, ensure_ascii=False),
    "J": lambda o: json.dumps(o, ensure_ascii=False, indent=2),
    "t": str,
    "y": _to_yaml,
}


def get_formatter(char: str) -> Callable[[object], str]:
    """Registry lookup; unknown key raises (parity with Formatters.get)."""
    if char not in FORMATTERS:
        raise KeyError(
            f"invalid format character {char!r}; valid: {VALID_CHARS}"
        )
    return FORMATTERS[char]


def normalize_format_chars(fmt: str) -> str:
    """'j' → 'jj'; 'jty' → 'jt'; invalid chars raise ValueError."""
    if not fmt:
        raise ValueError("empty format string")
    if len(fmt) == 1:
        fmt = fmt * 2
    fmt = fmt[:2]
    for c in fmt:
        if c not in FORMATTERS:
            raise ValueError(
                f"invalid format character {c!r}; valid: {VALID_CHARS}"
            )
    return fmt


MERGED_FORMATS = {"jj", "JJ", "yy"}


def result_hash(
    row: dict,
    *,
    include_source: bool = True,
    include_metadata: bool = True,
    include_text: bool = True,
) -> dict:
    """Projection of one extracted row into the reference's result-hash
    shape {source, metadata, text} keyed by boolean options (M12,
    ``rika_command.rb:141-147``)."""
    out: dict = {}
    if include_source:
        out["source"] = row.get("data_source") or row.get("url")
    if include_metadata:
        pairs = row.get("metadata") or []
        out["metadata"] = {p["key"]: p["value"] for p in pairs}
    if include_text:
        out["text"] = row.get("content")
    return out


def format_single_document(
    row: dict,
    fmt: str,
    *,
    include_source: bool = True,
    include_metadata: bool = True,
    include_text: bool = True,
) -> str:
    """One document → one output string (streaming sink unit, S6).

    Machine-readable same-code formats (jj/JJ/yy) emit one merged hash;
    otherwise a banner + per-section formatted output, like the reference's
    ``single_document_output``."""
    fmt = normalize_format_chars(fmt)
    h = result_hash(
        row,
        include_source=include_source,
        include_metadata=include_metadata,
        include_text=include_text,
    )
    if fmt in MERGED_FORMATS:
        return FORMATTERS[fmt[0]](h)
    meta_fmt, text_fmt = get_formatter(fmt[0]), get_formatter(fmt[1])
    parts: list[str] = []
    source = h.get("source")
    if include_source and source is not None:
        parts.append(f"-- Source: {source}")
    if include_metadata:
        parts.append(meta_fmt(h.get("metadata", {})))
    if include_text:
        parts.append(text_fmt(h.get("text") or ""))
    return "\n".join(parts)


def format_result_array(rows: list[dict], fmt: str, **kwargs) -> str:
    """Array sink (S7): materialize all result hashes, emit one JSON/YAML
    array — the documented non-scalable path (``README.md:220-231``)."""
    fmt = normalize_format_chars(fmt)
    hashes = [result_hash(r, **kwargs) for r in rows]
    return FORMATTERS[fmt[0]](hashes)
