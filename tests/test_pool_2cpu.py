"""Tiny-cluster pool-floor regression (round-5 fix in ``rika_ray.pool``):
the image pipeline chains two actor pools (decode → features) whose floor
actors at the conventional ``num_cpus=0.5`` must never reserve every
cluster CPU — on a 2-CPU cluster the old ``pool_spec`` floor of 2 put
2 pools × 2 actors × 0.5 CPU = 2.0 CPUs in eager reservations, the read
task could never schedule, and the streaming executor deadlocked silently
(no output, no error — the exact failure mode ``rika_ray/pool.py``'s
docstring warns about).

Runs in a subprocess because the session fixture pins ``num_cpus=4``,
where the bug is invisible.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from rika_ray.corpus import write_corpus
from rika_ray.pool import pool_spec


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("pool2") / "c")
    write_corpus(d, n_per_family=2, seed=13)
    return d + "/web_pages.parquet"


def test_pool_spec_floor_leaves_a_task_cpu():
    # session fixture runs at 4 CPUs: floor capped at cluster-1 = 3 → 2
    lo, hi = pool_spec()
    assert lo >= 1
    assert lo <= max(1, 4 - 1)


def test_image_pipeline_completes_at_2_cpus(small_corpus):
    script = (
        "import ray, json\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False,\n"
        "         logging_level='ERROR')\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars = False\n"
        "from rika_ray.pipelines.extraction import read_web_pages\n"
        "from rika_ray.pipelines.multimodal import image_feature_pipeline\n"
        f"ds = read_web_pages({small_corpus!r})\n"
        "rows = image_feature_pipeline(ds, target_size=(16, 16)).take_all()\n"
        "ok = [r for r in rows if r['error'] is None]\n"
        "print('RESULT:' + json.dumps({'n': len(rows), 'ok': len(ok)}))\n"
        "ray.shutdown()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        # deadlock gate: the healthy run finishes in ~20 s; the starved
        # pool produces nothing forever
        timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    got = json.loads(line[0][len("RESULT:"):])
    assert got["n"] > 0
    assert got["ok"] > 0
