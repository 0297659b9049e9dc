"""Local stand-in for the driver's CORRECTNESS gate: run each queries()
entry AND its oracle_sql() side by side over a testdata sf dir, compare
row count, column names, dtypes, and name-sorted values.

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and ALL oracled queries. Runs at
num_cpus=32 to match the driver (the round-3 neardup_clusters crash only
fired there).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
    )
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    names = [q for q in queries if q in oracles and (not only or q in only)]
    rows_only = [q for q in queries if q not in oracles and (not only or q in only)]
    for name in names:
        t0 = time.perf_counter()
        try:
            got = _to_pandas(queries[name](sf_dir)).reset_index(drop=True)
            exp = con.execute(oracles[name]).df().reset_index(drop=True)
            problems = []
            if len(got) != len(exp):
                problems.append(f"rows {len(got)} != {len(exp)}")
            if sorted(got.columns) != sorted(exp.columns):
                problems.append(
                    f"cols {sorted(got.columns)} != {sorted(exp.columns)}"
                )
            if not problems:
                g = got[sorted(got.columns)]
                e = exp[sorted(exp.columns)]
                for c in g.columns:
                    if str(g[c].dtype) != str(e[c].dtype):
                        problems.append(
                            f"dtype[{c}] {g[c].dtype} != {e[c].dtype}"
                        )
                try:
                    import pandas.testing as pdt

                    pdt.assert_frame_equal(
                        g, e, check_dtype=False, check_exact=True
                    )
                except AssertionError as ae:
                    problems.append(f"values: {str(ae)[:200]}")
            dt = time.perf_counter() - t0
            if problems:
                n_fail += 1
                print(f"FAIL {name} ({dt:.1f}s): {'; '.join(problems)}")
            else:
                print(f"ok   {name} ({dt:.1f}s, {len(got)} rows)")
        except Exception as exc:  # noqa: BLE001 — report and continue
            n_fail += 1
            print(
                f"ERROR {name} ({time.perf_counter()-t0:.1f}s): "
                f"{type(exc).__name__}: {str(exc)[:300]}"
            )
    for name in rows_only:
        t0 = time.perf_counter()
        try:
            got = _to_pandas(queries[name](sf_dir))
            print(
                f"ok   {name} (rows-only, {time.perf_counter()-t0:.1f}s, "
                f"{len(got)} rows)"
            )
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(
                f"ERROR {name} ({time.perf_counter()-t0:.1f}s): "
                f"{type(exc).__name__}: {str(exc)[:300]}"
            )

    ray.shutdown()
    print(f"{'FAILURES: ' + str(n_fail) if n_fail else 'ALL GREEN'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
