"""Mega-document skew routing at the driver's CPU count (BASELINE.json's
explicit skew requirement; VERDICT r4 item 9): one ~50 MB document in an
otherwise-small corpus must be isolated into its own block by
``route_mega_docs=True`` and extracted byte-complete WITHOUT stalling the
sibling batches — the whole run is held to a wall-clock budget that a
head-of-line-blocked pool would blow.

Runs in a subprocess because the session fixture pins ``num_cpus=4`` and
skew routing regressions historically fired only at 32 (the round-3
``neardup_clusters`` crash pattern).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rika_ray.corpus import write_corpus

MEGA_BYTES = 50_000_000


@pytest.fixture(scope="module")
def mega_corpus(tmp_path_factory) -> str:
    base = tmp_path_factory.mktemp("mega32")
    d = str(base / "c")
    write_corpus(d, n_per_family=2, seed=11)
    path = os.path.join(d, "web_pages.parquet")
    tbl = pq.read_table(path)
    para = ("mega skew payload wordstream " * 8 + "\n").encode()
    blob = para * (MEGA_BYTES // len(para) + 1)  # ≥ 50 MB ASCII text
    row = {}
    for field in tbl.schema:
        if field.name == "url":
            val = "https://synthetic.test/mega-50mb"
        elif field.name == "html":
            val = blob
        else:
            val = tbl[field.name][0].as_py()
        row[field.name] = pa.array([val], field.type)
    merged = pa.concat_tables(
        [tbl, pa.table(row, schema=tbl.schema)]
    )
    pq.write_table(merged, path)
    return path


def test_mega_doc_routed_extraction_at_32_cpus(mega_corpus):
    script = (
        "import ray, json\n"
        "ray.init(address='local', num_cpus=32, include_dashboard=False,\n"
        "         logging_level='ERROR')\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars = False\n"
        "import pyarrow as pa, pyarrow.compute as pc\n"
        "from rika_ray.pipelines.extraction import (\n"
        "    ExtractionConfig, build_extraction_pipeline, read_web_pages)\n"
        f"ds = read_web_pages({mega_corpus!r})\n"
        "cfg = ExtractionConfig(route_mega_docs=True,\n"
        "                       mega_doc_bytes=4 * 1024 * 1024)\n"
        "out = build_extraction_pipeline(ds, cfg)\n"
        "def slim(b: pa.Table) -> pa.Table:\n"
        "    return pa.table({'url': b['url'],\n"
        "                     'n_chars': pc.utf8_length(b['content']),\n"
        "                     'err': b['error_type']})\n"
        "rows = out.map_batches(slim, batch_format='pyarrow').take_all()\n"
        "mega = [r for r in rows if r['url'].endswith('mega-50mb')]\n"
        "print('RESULT:' + json.dumps({'n': len(rows),\n"
        "    'mega_chars': mega[0]['n_chars'], 'mega_err': mega[0]['err']}))\n"
        "ray.shutdown()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        # stall gate: the 4-CPU CI host extracts this corpus in well under
        # a minute when the mega doc rides its own block; a pool stalled
        # behind a 50 MB head-of-line batch times out here
        timeout=420,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    got = json.loads(line[0][len("RESULT:"):])
    assert got["mega_err"] is None
    # byte-complete: ASCII payload ⇒ chars == bytes written
    assert got["mega_chars"] >= MEGA_BYTES
    assert got["n"] > 100  # siblings all extracted too
