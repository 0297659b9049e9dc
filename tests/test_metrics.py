"""A4 metrics: per-stage breakdown parsed from Dataset.stats()."""

from __future__ import annotations


def test_extraction_metrics(ray_session, corpus_dir, tmp_path):
    from rika_ray.pipelines.extraction import (
        ExtractionConfig, build_extraction_pipeline, read_web_pages)
    from rika_ray.state.metrics import extraction_metrics

    ds = read_web_pages(f"{corpus_dir}/web_pages.parquet")
    out = build_extraction_pipeline(ds, ExtractionConfig())
    out.write_parquet(str(tmp_path / "mx"))  # stats populate on execution
    m = extraction_metrics(out)
    assert m["docs"] is not None and m["docs"] > 0
    assert any("FusedExtractStage" in s["operator"] for s in m["stages"])
    for s in m["stages"]:
        assert s["wall_s"] >= 0
