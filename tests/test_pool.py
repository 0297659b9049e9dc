"""Cluster-aware pool sizing: stage concurrency must scale with
``ray.cluster_resources()``, not be pinned to a constant (round-1 verdict:
hardcoded concurrency=2 caps every auxiliary stage at ~1 CPU total on any
cluster size)."""

from __future__ import annotations

import rika_ray.pool as pool_mod
from rika_ray.pool import pool_size, pool_spec


def test_pool_size_scales_with_cluster(monkeypatch):
    sizes = {}
    for ncpu in (4, 8, 32, 128, 1024):
        monkeypatch.setattr(pool_mod, "cluster_cpus", lambda n=ncpu: n)
        sizes[ncpu] = pool_mod.pool_size()
    # monotone and CPU-proportional (default 0.5 actors per CPU)
    assert sizes[8] == 4 and sizes[32] == 16 and sizes[128] == 64
    assert sizes[1024] == 512
    assert sizes[4] == 2  # floor


def test_pool_spec_autoscaling_bounds(monkeypatch):
    monkeypatch.setattr(pool_mod, "cluster_cpus", lambda: 32)
    lo, hi = pool_mod.pool_spec()
    assert lo == 2 and hi == 16
    monkeypatch.setattr(pool_mod, "cluster_cpus", lambda: 128)
    lo, hi = pool_mod.pool_spec()
    assert lo == 2 and hi == 64


def test_extraction_pool_fraction(monkeypatch):
    monkeypatch.setattr(pool_mod, "cluster_cpus", lambda: 32)
    assert pool_mod.pool_size(0.75, floor=1) == 24
    monkeypatch.setattr(pool_mod, "cluster_cpus", lambda: 8)
    assert pool_mod.pool_size(0.75, floor=1) == 6


def test_no_hardcoded_aux_pools_left():
    """Regression guard: no auxiliary pipeline pins concurrency to a
    constant; every map_batches pool routes through pool_spec()/
    pool_size()."""
    import pathlib

    root = pathlib.Path(pool_mod.__file__).parent / "pipelines"
    for p in root.glob("*.py"):
        src = p.read_text()
        assert "concurrency=2," not in src and "concurrency=2)" not in src, (
            p.name
        )


def test_pool_size_live_cluster(ray_session):
    """With the 4-CPU test cluster, the helper reads the live resource
    count (not the no-Ray default)."""
    import ray

    ncpu = int(ray.cluster_resources()["CPU"])
    assert pool_size(1.0, floor=1) == ncpu
