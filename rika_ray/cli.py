"""rika-ray CLI (SURVEY.md §2.1 S3-S8, §3.2/3.3 lifecycle).

The streaming-engine port of the reference CLI
(``/root/reference/exe/rika``, ``lib/rika/cli/rika_command.rb``): glob/
validate many file-or-URL targets (or a web_pages parquet table), run the
extraction pipeline, emit per-document output in the six serialization
formats, accumulate the typed bad-target report on stderr, and exit 1 iff
any target failed.

Usage examples::

    python -m rika_ray.cli doc.pdf pages/*.html          # files, streaming
    python -m rika_ray.cli -f JJ -a doc1.txt doc2.txt    # one JSON array
    python -m rika_ray.cli --input-parquet web_pages.parquet -o out/
    RIKA_RAY_OPTIONS="-f yy" python -m rika_ray.cli x.txt  # env options

The CLI owns its Ray session (guarded init — never inside library code).
"""

from __future__ import annotations

import argparse
import sys

from rika_ray.formatters import (
    format_result_array,
    format_single_document,
    normalize_format_chars,
)
from rika_ray.sources.targets import (
    classify_targets,
    prepend_environment_args,
)


def _bool_opt(value: str) -> bool:
    # +/-/yes/no/true/false forms (reference boolean-option matrix,
    # spec/rika/cli/args_parser/boolean_options_spec.rb)
    v = value.strip().lower()
    if v in ("+", "yes", "true", "1", "on"):
        return True
    if v in ("-", "no", "false", "0", "off"):
        return False
    raise argparse.ArgumentTypeError(f"not a boolean: {value!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rika-ray",
        description="Ray-Data-native document extraction engine",
    )
    p.add_argument("targets", nargs="*", help="files, globs, or URLs")
    p.add_argument("-f", "--format", default="at",
                   help="1-2 format chars from [aijJty] (metadata, text)")
    p.add_argument("-m", "--metadata", type=_bool_opt, default=True,
                   metavar="BOOL", help="include metadata (default true)")
    p.add_argument("-t", "--text", type=_bool_opt, default=True,
                   metavar="BOOL", help="include text (default true)")
    p.add_argument("-s", "--source", type=_bool_opt, default=True,
                   metavar="BOOL", help="include source line (default true)")
    p.add_argument("-k", "--key-sort", type=_bool_opt, default=True,
                   metavar="BOOL", help="sort metadata keys (default true)")
    p.add_argument("-a", "--as-array", action="store_true",
                   help="materialize all results as one array")
    p.add_argument("-l", "--max-content-length", type=int, default=-1,
                   help="-1 unlimited, 0 suppress text, N chars")
    p.add_argument("-n", "--dry-run", action="store_true",
                   help="print the plan without parsing")
    p.add_argument("--input-parquet", default=None,
                   help="web_pages parquet path (table mode)")
    p.add_argument("-o", "--output", default=None,
                   help="write extracted parquet here instead of stdout")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: all)")
    import rika_ray

    p.add_argument("-v", "--version", action="version",
                   version=f"rika-ray {rika_ray.__version__}")
    return p


def main(argv: list[str] | None = None) -> int:
    argv = prepend_environment_args(
        list(sys.argv[1:] if argv is None else argv)
    )
    parser = build_parser()
    args = parser.parse_args(argv)
    try:
        fmt = normalize_format_chars(args.format)
    except ValueError as e:
        print(f"rika-ray: {e}", file=sys.stderr)
        return 2

    # --- target classification (file mode) ---
    classification = classify_targets(args.targets)
    bad_targets: dict[str, list[str]] = {
        k: list(v) for k, v in classification.issues.items()
    }

    if args.input_parquet is None and not classification.targets:
        _report_bad_targets(bad_targets)
        return 1 if bad_targets else 0

    if args.dry_run:
        print("rika-ray dry run:")
        if args.input_parquet:
            print(f"  table: {args.input_parquet}")
        for t in classification.targets:
            print(f"  target: {t}")
        for kind, items in bad_targets.items():
            for t in items:
                print(f"  issue[{kind}]: {t}")
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rika_ray.pipelines.extraction import (
        ExtractionConfig,
        build_extraction_pipeline,
        read_web_pages,
    )

    cfg = ExtractionConfig(
        max_content_length=args.max_content_length,
        key_sort=args.key_sort,
    )

    if args.input_parquet is not None:
        ds = read_web_pages(args.input_parquet)
    else:
        file_targets = [
            t for t in classification.targets if not t.startswith(("http://", "https://"))
        ]
        url_targets = [
            t for t in classification.targets if t.startswith(("http://", "https://"))
        ]
        # crawl archives route through the WARC reader (one row per crawl
        # record); every other file is one document. Common Crawl derived
        # files (*.warc.wet.gz extracted-text, *.warc.wat.gz metadata) are
        # WARC-framed too — the reader's record-type filter handles the
        # rest (conversion records carried, metadata records skipped).
        warc_targets = [
            t for t in file_targets
            if t.endswith(
                (".warc", ".warc.gz", ".wet", ".wet.gz", ".wat", ".wat.gz")
            )
        ]
        file_targets = [t for t in file_targets if t not in warc_targets]
        parts = []
        if file_targets:
            from rika_ray.sources.ingest import read_files_as_web_pages

            parts.append(read_files_as_web_pages(file_targets))
        if warc_targets:
            from rika_ray.sources.warc import read_warc

            parts.append(read_warc(warc_targets))
        if url_targets:
            import ray.data as rd

            from rika_ray.sources.ingest import fetch_to_table

            import pyarrow.compute as pc

            fetched = fetch_to_table(url_targets)
            for r in fetched.to_pylist():
                if r["error_type"]:
                    bad_targets.setdefault(r["error_type"], []).append(r["url"])
            ok = fetched.filter(
                pc.is_null(fetched["error_type"])
            ).drop_columns(["error_type", "error_message"])
            if len(ok):
                parts.append(rd.from_arrow(ok))
        if not parts:
            _report_bad_targets(bad_targets)
            return 1 if bad_targets else 0
        ds = parts[0]
        for extra in parts[1:]:
            ds = ds.union(extra)

    extracted = build_extraction_pipeline(ds, cfg)

    exit_code = 0
    if args.output:
        extracted.write_parquet(args.output)
        # tally errors from the written output — no pipeline re-execution
        import ray.data as rd

        from rika_ray.pipelines.extraction import error_tally

        tally = error_tally(
            rd.read_parquet(args.output, columns=["error_type"])
        ).take_all()
        for row in tally:
            if row["error_type"] is not None:
                bad_targets.setdefault(row["error_type"], []).append(
                    f"{row['count()']} rows"
                )
    else:
        kwargs = dict(
            include_source=args.source,
            include_metadata=args.metadata,
            include_text=args.text,
        )
        if args.as_array:
            rows = extracted.take_all()  # the documented non-scalable path
            good = [r for r in rows if r["error_type"] is None]
            for r in rows:
                if r["error_type"] is not None:
                    bad_targets.setdefault(r["error_type"], []).append(r["url"])
            print(format_result_array(good, fmt, **kwargs))
        else:
            # streaming: one document at a time, pipelined (S6)
            for batch in extracted.iter_batches(
                batch_size=64, batch_format="pyarrow"
            ):
                for r in batch.to_pylist():
                    if r["error_type"] is not None:
                        bad_targets.setdefault(r["error_type"], []).append(
                            r["url"]
                        )
                        continue
                    print(format_single_document(r, fmt, **kwargs))

    _report_bad_targets(bad_targets)
    if bad_targets:
        exit_code = 1
    return exit_code


def _report_bad_targets(bad_targets: dict[str, list[str]]) -> None:
    """End-of-run stderr report (``rika_command.rb:94-123``)."""
    if not bad_targets:
        return
    total = sum(len(v) for v in bad_targets.values())
    print(f"rika-ray: {total} bad target(s):", file=sys.stderr)
    for kind in sorted(bad_targets):
        for t in bad_targets[kind]:
            print(f"  {kind}: {t}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
