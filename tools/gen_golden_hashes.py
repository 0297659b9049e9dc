"""Regenerate the checked-in golden ground-truth table for the
extraction-level driver oracles (``extract_content_hashes``,
``extract_media_tally``, ``extract_error_tally``, ``warc_media_tally``,
``image_features_decoded``).

Every column is derived from the corpus generator's
``expected_extractions`` ground truth at the sf0.01 tier — NOT from a
pipeline run, so the oracles are independent of the code under test:

- ``url`` / ``content_md5`` — byte-identity invariant per document;
- ``media_type`` / ``error_type`` — sniffer-dispatch + error-taxonomy
  ground truth (GROUP BY oracles for the tallies);
- ``in_warc`` — whether the row survives the WARC round trip (rows with
  an empty/absent payload never become WARC records);
- ``img_mean_r/g/b`` — decoded-pixel channel means at the 16×16 resize
- ``audio_n_frames`` / ``audio_energy`` — decoded-PCM frame count + mean
  frame energy for the real-codec audio fixtures (WAV, FLAC)
- ``vid_n_sampled`` / ``vid_mean_r/g/b`` — sampled-frame count + mean
  per-frame channel means for the real-codec video fixtures (MJPEG AVI)
  target, computed from the generator's SOURCE pixel arrays (real-codec
  formats only; null elsewhere).

Re-run this (and commit the result) whenever
``rika_ray.corpus.CORPUS_VERSION`` changes; ``tests/test_golden_hashes.py``
fails loudly if the file is stale.

Usage: python tools/gen_golden_hashes.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from rika_ray.corpus import CORPUS_VERSION, generate_corpus

# sf tier → n_per_family, must match __ray_entry__._CORPUS_SCALE
SF001_N_PER_FAMILY = 10

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rika_ray",
    "data",
    "golden_content_hashes_sf0.01.parquet",
)


def golden_table(n_per_family: int = SF001_N_PER_FAMILY) -> pa.Table:
    pages, expected = generate_corpus(n_per_family=n_per_family, seed=42)
    urls = expected["url"].to_pylist()
    contents = expected["content"].to_pylist()
    # "" (not NULL) for error rows: the hash column is a SORT KEY in the
    # driver query, and Ray's sort comparators crash on null strings
    hashes = [
        hashlib.md5(c.encode("utf-8")).hexdigest() if c is not None else ""
        for c in contents
    ]
    # pages and expected are built in lockstep — positional alignment is
    # the only correct join (the dup-url family repeats a url)
    in_warc = [bool(h) for h in pages["html"].to_pylist()]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "content_md5": pa.array(hashes, pa.string()),
            "media_type": expected["media_type"],
            "error_type": expected["error_type"],
            "in_warc": pa.array(in_warc, pa.bool_()),
            "img_mean_r": expected["img_mean_r"],
            "img_mean_g": expected["img_mean_g"],
            "img_mean_b": expected["img_mean_b"],
            "audio_n_frames": expected["audio_n_frames"],
            "audio_energy": expected["audio_energy"],
            "vid_n_sampled": expected["vid_n_sampled"],
            "vid_mean_r": expected["vid_mean_r"],
            "vid_mean_g": expected["vid_mean_g"],
            "vid_mean_b": expected["vid_mean_b"],
        }
    )
    return t.sort_by([("url", "ascending"), ("content_md5", "ascending")])


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    t = golden_table()
    t = t.replace_schema_metadata({"corpus_version": str(CORPUS_VERSION)})
    pq.write_table(t, OUT)
    print(f"wrote {OUT}: {t.num_rows} rows, corpus v{CORPUS_VERSION}")


if __name__ == "__main__":
    main()
