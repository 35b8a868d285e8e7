"""Local simulation of the driver's correctness gate.

Runs every queries() entry at a given sf_dir and compares against
oracle_sql() via DuckDB (row count + column names + order-insensitive
value hash), the same way the driver does. Usage:

    python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    # order-insensitive: sort by all columns
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(pd.util.hash_pandas_object(df[c].astype(str), index=False)
                 .to_numpy().tobytes())
    return h.hexdigest()[:16]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import os
    # keep the oracle transcripts CTE on the SAME sf as the views —
    # must be set before __ray_entry__ is imported
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(got)} (no oracle, rows-only check)")
            continue
        try:
            exp = normalize(con.execute(sql).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
            diff = (got.astype(str) != exp.astype(str)) if got.shape == exp.shape else None
            if diff is not None and diff.any().any():
                i = diff.any(axis=1).idxmax()
                problems.append(f"first diff row {i}: got={got.loc[i].to_dict()} "
                                f"exp={exp.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} hash={value_hash(got)}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, names) else 0)
