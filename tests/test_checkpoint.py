"""Resume tests (SURVEY.md §5.2 layer 5): kill after K partitions, restart,
verify output equals a single-run output and only N−K partitions recompute."""

from __future__ import annotations

import glob
import os

import pytest

from rika_ray.corpus import write_corpus
from rika_ray.state.checkpoint import (
    combined_content_hash,
    completed_partitions,
    run_partitioned_extraction,
)


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    """Three input shards (separate small corpora with disjoint urls)."""
    base = tmp_path_factory.mktemp("shards")
    files = []
    for i, seed in enumerate((42, 43, 44)):
        d = base / f"shard{i}"
        write_corpus(str(d), n_per_family=1, seed=seed)
        src = str(d / "web_pages.parquet")
        dst = str(base / f"shard-{i}.parquet")
        os.rename(src, dst)
        files.append(dst)
    return files


def test_full_run_then_resume_noop(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "out")
    summary = run_partitioned_extraction(sharded_input, out)
    assert summary["processed"] == 3 and summary["skipped"] == 0
    assert len(completed_partitions(out)) == 3
    h1 = combined_content_hash(out)

    # second run: everything skipped, nothing rewritten
    summary2 = run_partitioned_extraction(sharded_input, out)
    assert summary2["processed"] == 0 and summary2["skipped"] == 3
    assert combined_content_hash(out) == h1


def test_crash_resume_equals_single_run(ray_session, sharded_input, tmp_path):
    out_a = str(tmp_path / "single")
    run_partitioned_extraction(sharded_input, out_a)

    out_b = str(tmp_path / "crashed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned_extraction(sharded_input, out_b, fail_after=1)
    assert len(completed_partitions(out_b)) == 1

    summary = run_partitioned_extraction(sharded_input, out_b)
    assert summary["skipped"] == 1 and summary["processed"] == 2
    assert combined_content_hash(out_b) == combined_content_hash(out_a)
    # same parquet row counts per partition
    for part in ("part-00000", "part-00001", "part-00002"):
        a = glob.glob(f"{out_a}/{part}/*.parquet")
        b = glob.glob(f"{out_b}/{part}/*.parquet")
        assert a and b


def test_pipelined_equals_serial(ray_session, sharded_input, tmp_path):
    """Bounded K-in-flight partition pipelining (VERDICT r4 #4): same
    committed outputs and whole-run content identity as the serial loop,
    and a pipelined run resumes as a noop."""
    out_s = str(tmp_path / "serial")
    s1 = run_partitioned_extraction(sharded_input, out_s, max_in_flight=1)
    assert s1["max_in_flight"] == 1 and s1["processed"] == 3

    out_p = str(tmp_path / "pipelined")
    s2 = run_partitioned_extraction(sharded_input, out_p, max_in_flight=3)
    assert s2["max_in_flight"] == 3 and s2["processed"] == 3
    assert len(completed_partitions(out_p)) == 3
    assert combined_content_hash(out_p) == combined_content_hash(out_s)

    s3 = run_partitioned_extraction(sharded_input, out_p)
    assert s3["skipped"] == 3 and s3["processed"] == 0


def test_manifest_lineage_fields(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "lineage")
    run_partitioned_extraction(sharded_input, out)
    for entry in completed_partitions(out).values():
        assert entry["docs"] > 0
        assert entry["input_files"] and os.path.exists(entry["input_files"][0])
        assert entry["docs_per_sec"] > 0
        assert isinstance(entry["content_hash"], int)
        assert entry["engine_version"]


def test_tallies_over_committed_partitions(ray_session, sharded_input, tmp_path):
    """Wide ops after a crash run only over durable partition outputs —
    the partition-granular "resume mid-shuffle" semantics."""
    from rika_ray.state.checkpoint import tallies_from_checkpoint

    out = str(tmp_path / "tally")
    with pytest.raises(RuntimeError):
        run_partitioned_extraction(sharded_input, out, fail_after=2)
    partial = tallies_from_checkpoint(out)  # 2 committed partitions
    partial_total = sum(r["count()"] for r in partial["error_tally"])

    run_partitioned_extraction(sharded_input, out)  # resume
    full = tallies_from_checkpoint(out)
    full_total = sum(r["count()"] for r in full["error_tally"])
    assert full_total > partial_total
    media = {r["media_type"] for r in full["media_type_tally"]}
    assert "text/html" in media and "application/pdf" in media


def test_resume_rejects_changed_shard_list(ray_session, sharded_input, tmp_path):
    """A resume whose sorted-shard→partition mapping shifted must fail
    loudly, never silently skip the wrong inputs (manifest lineage is the
    identity, not the sort index)."""
    import shutil

    out = str(tmp_path / "drift")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned_extraction(sharded_input, out, fail_after=1)

    base = os.path.dirname(sharded_input[0])
    # rename shard 0 so it sorts AFTER the others: pid 0 now maps to a
    # different file than the committed manifest entry records
    renamed = os.path.join(base, "z-shard-0.parquet")
    shutil.copy(sharded_input[0], renamed)
    drifted = [renamed] + sharded_input[1:]
    try:
        with pytest.raises(RuntimeError, match="manifest mismatch"):
            run_partitioned_extraction(drifted, out)
        # shrunk shard list → orphan committed partitions → loud failure
        run_partitioned_extraction(sharded_input, out)  # heal: finish normally
        with pytest.raises(RuntimeError, match="shard list shrank"):
            run_partitioned_extraction(sharded_input[:1], out)
    finally:
        os.remove(renamed)
