"""Driver-mimic: run every __spark_entry__ query against its DuckDB
oracle at a given sf dir, compare row count, schema width, and
order-insensitive values (exact match after per-column rounding already
applied by the queries themselves).

Usage: PYTHONPATH=/root/repo python tools/oracle_check.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def _raw_fingerprint(df: pd.DataFrame) -> tuple:
    """Driver-style strict fingerprint: dtype kind per column plus a
    row-order-insensitive value hash with NO dtype normalization — an
    int64 column and a float64/object (e.g. DuckDB HUGEINT) column of
    equal values fingerprint differently, exactly the class of miss
    the round-3 `sequence_packing` driver row surfaced."""
    df = df[sorted(df.columns)]
    s = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1) if len(df) else pd.Series([], dtype=str)
    kinds = tuple(df[c].dtype.kind for c in df.columns)
    return kinds, int(pd.util.hash_pandas_object(s.sort_values(), index=False).sum())


def compare(name: str, spark_df, sql: str | None, con) -> str:
    t0 = time.time()
    sp = spark_df.toPandas()
    t_spark = time.time() - t0
    if sql is None:
        return f"ROWSONLY {name}: rows={len(sp)} ({t_spark:.1f}s)"
    t0 = time.time()
    du = con.sql(sql).df()
    t_duck = time.time() - t0
    sp = sp[sorted(sp.columns)]
    du = du[sorted(du.columns)]
    if list(sp.columns) != list(du.columns):
        return f"FAIL {name}: columns {list(sp.columns)} vs {list(du.columns)}"
    if len(sp) != len(du):
        return f"FAIL {name}: rows {len(sp)} vs {len(du)}"
    raw_sp, raw_du = _raw_fingerprint(sp), _raw_fingerprint(du)
    # normalize dtypes then order-insensitive compare
    for c in sp.columns:
        if sp[c].dtype != du[c].dtype:
            try:
                du[c] = du[c].astype(sp[c].dtype)
            except (TypeError, ValueError):
                pass
    sps = sp.sort_values(list(sp.columns)).reset_index(drop=True)
    dus = du.sort_values(list(du.columns)).reset_index(drop=True)
    if not sps.equals(dus):
        neq = (sps != dus) & ~(sps.isna() & dus.isna())
        bad = neq.any(axis=1)
        detail = ""
        if bad.any():
            i = bad.idxmax()
            detail = f" first diff row {i}: spark={sps.loc[i].tolist()} duck={dus.loc[i].tolist()}"
        return f"FAIL {name}: values differ ({int(bad.sum())} rows){detail}"
    if raw_sp != raw_du:
        return (
            f"FAIL {name}: values equal but raw fingerprints differ "
            f"(dtype kinds spark={raw_sp[0]} duck={raw_du[0]}) — likely a "
            f"missing CAST in the oracle (HUGEINT/float widening)"
        )
    return f"OK   {name}: rows={len(sp)} (spark {t_spark:.1f}s, duck {t_duck:.1f}s)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from linkgraph.datasets import TABLES
    from linkgraph.session import build_session

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = build_session("oracle-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            line = compare(name, fn(spark, sf_dir), oracles.get(name), con)
        except Exception as ex:  # noqa: BLE001
            line = f"ERROR {name}: {type(ex).__name__}: {str(ex).splitlines()[0][:300]}"
        print(line, flush=True)
        failures += line.startswith(("FAIL", "ERROR"))
    extra = set(oracles) - set(qs)
    if extra:
        print(f"FAIL oracle-without-query: {sorted(extra)}")
        failures += 1
    print(f"DONE failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
