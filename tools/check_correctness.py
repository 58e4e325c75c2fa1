"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` callable at the given sf and
compares row count, column names and an order-insensitive value hash
against ``oracle_sql()`` via DuckDB (views pre-registered like the
driver does).  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    sys.path.insert(0, "/root/repo")  # script dir is tools/, not the repo
    from scoobie_ray.util import quiet_ray_data_chatter

    def _worker_quiet_hook() -> None:
        # self-contained mirror of quiet_ray_data_chatter: worker-side
        # filter for the schema-hash warning logged by shuffle reduce
        # tasks (a scoobie_ray reference can't deserialize at worker
        # bootstrap); pickled by value from __main__
        import logging

        class _DropKnown(logging.Filter):
            def filter(self, record: logging.LogRecord) -> bool:
                msg = record.getMessage()
                if "Failed to hash the schemas" in msg:
                    return False
                if (
                    "RefBundle with a different schema" in msg
                    and "new schema: ." in msg
                ):
                    return False
                return True

        for name in (
            "ray.data",
            "ray.data._internal.execution.streaming_executor_state",
            "ray.data._internal.arrow_ops.transform_pyarrow",
        ):
            logging.getLogger(name).addFilter(_DropKnown())

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # worker-side filter too: the schema-hash warning is logged by
        # shuffle reduce tasks in worker processes
        runtime_env={"worker_process_setup_hook": _worker_quiet_hook},
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    quiet_ray_data_chatter()
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows   {name}: {len(mine)} rows (rows-only check)")
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = sorted(mine.columns) == sorted(theirs.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(theirs)
        status = "OK    " if (ok_rows and ok_cols and ok_hash) else "FAIL  "
        print(
            f"{status} {name}: rows {len(mine)}/{len(theirs)}"
            f" cols={'=' if ok_cols else sorted(mine.columns)}"
            f" hash={'=' if ok_hash else 'MISMATCH'}"
        )
        if not (ok_rows and ok_cols and ok_hash):
            failures += 1
            if not ok_hash and ok_rows and ok_cols:
                m = mine[sorted(mine.columns)].astype(str)
                t_ = theirs[sorted(theirs.columns)].astype(str)
                ms = set(map(tuple, m.itertuples(index=False, name=None)))
                ts = set(map(tuple, t_.itertuples(index=False, name=None)))
                print("   only-engine:", list(ms - ts)[:3])
                print("   only-oracle:", list(ts - ms)[:3])
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
