"""REPL helper shortcuts (SURVEY.md §2.9; analogue of the reference's
``rika_helper.rb:18-31`` aliases ``pa``/``c``/``m``...).

Convenience one-liners for interactive sessions::

    >>> from rika_ray.shortcuts import parse, content, metadata, language
    >>> parse("doc.pdf")["content"]

Each helper runs the full pipeline on a single local file or URL and
returns plain Python values. They own no Ray session (auto-init via
Ray Data when standalone, guarded)."""

from __future__ import annotations

from typing import Any


def parse(target: str, **cfg_kwargs) -> dict[str, Any]:
    """Parse one file/URL → the extracted row as a dict (the ParseResult
    analogue, ``lib/rika/parse_result.rb:5-15``)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from rika_ray.pipelines.extraction import (
        ExtractionConfig,
        build_extraction_pipeline,
    )

    if target.startswith(("http://", "https://")):
        import ray.data as rd

        from rika_ray.sources.ingest import fetch_to_table

        tbl = fetch_to_table([target])
        err = tbl.column("error_type")[0].as_py()
        if err is not None:
            raise OSError(
                f"{err}: {tbl.column('error_message')[0].as_py()}"
            )
        ds = rd.from_arrow(tbl.drop_columns(["error_type", "error_message"]))
    else:
        from rika_ray.sources.ingest import read_files_as_web_pages

        ds = read_files_as_web_pages([target])
    rows = build_extraction_pipeline(
        ds, ExtractionConfig(**cfg_kwargs)
    ).take_all()
    return rows[0]


def content(target: str) -> str | None:
    """Alias ``c``: extracted text only (Rika.parse(...).content)."""
    return parse(target)["content"]


def metadata(target: str) -> dict[str, str]:
    """Alias ``m``: metadata hash only."""
    return {p["key"]: p["value"] for p in parse(target)["metadata"] or []}


def language(target: str) -> str | None:
    return parse(target)["language"]


def content_type(target: str) -> str | None:
    return parse(target)["content_type"]


# the reference's terse aliases
c = content
m = metadata
lang = language
ct = content_type
