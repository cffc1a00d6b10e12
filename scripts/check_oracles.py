"""Local stand-in for the driver's correctness gate: run each queries()
entry at sf0.01 and compare row-count + schema + order-insensitive
values against oracle_sql() via DuckDB."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# corpus-derived oracle constants (ann_ivf codebook) must follow the
# sweep's scale; the driver's gate runs at the sf0.01 default
os.environ["NIPPER_RAY_ORACLE_SF"] = SF_DIR
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE OR REPLACE VIEW %s AS SELECT * FROM "
            "read_parquet('%s/%s.parquet')" % (t, SF_DIR, t))

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(SF_DIR)))
        except Exception as e:
            print("%-20s ERROR %r" % (name, e))
            fails += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print("%-20s rows-only  %6d rows  %.1fs" % (name, len(mine), dt))
            continue
        try:
            gold = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print("%-20s ORACLE-SQL-ERROR %r" % (name, e))
            fails += 1
            continue
        ok = True
        if list(mine.columns) != list(gold.columns):
            print("%-20s SCHEMA MISMATCH mine=%s gold=%s"
                  % (name, list(mine.columns), list(gold.columns)))
            ok = False
        elif len(mine) != len(gold):
            print("%-20s ROWCOUNT MISMATCH mine=%d gold=%d"
                  % (name, len(mine), len(gold)))
            ok = False
        else:
            for c in mine.columns:
                a, b = mine[c], gold[c]
                # driver hashes values -> int64 vs float64 hash-mismatches
                # even when values are equal; be strict locally too
                if a.dtype.kind != b.dtype.kind:
                    print("%-20s DTYPE MISMATCH col=%s mine=%s gold=%s"
                          % (name, c, a.dtype, b.dtype))
                    ok = False
                    break
                try:
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        same = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
                    else:
                        same = (a.astype(str) == b.astype(str))
                    if not same.all():
                        bad = (~same).idxmax()
                        print("%-20s VALUE MISMATCH col=%s row=%d "
                              "mine=%r gold=%r"
                              % (name, c, bad, a[bad], b[bad]))
                        ok = False
                        break
                except Exception as e:
                    print("%-20s COMPARE-ERROR col=%s %r" % (name, c, e))
                    ok = False
                    break
        if ok:
            print("%-20s OK        %6d rows  %.1fs" % (name, len(mine), dt))
        else:
            fails += 1
    ray.shutdown()
    print("FAILURES:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
