#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (SURVEY.md §5.1).

Usage: preflight.py <sfDir> <verifyOutDir> [key ...]

DRIVER-FAITHFUL since r12: the r11 verdict root-caused six false-green
keys to this tool reading the *Spark* parquet back through DuckDB
`read_parquet`, which coerced both sides' DECIMAL/HUGEINT identically
and hid exactly the dtype seams the driver's pandas-level hash trips
on. The compare now mirrors the driver's actual path:

  Spark side : pyarrow.parquet -> pandas  (how the driver loads it)
  oracle side: duckdb.execute(sql).df()   (how the driver runs it)

then sorts columns by name, compares **pandas dtypes** per column
(cursor-description dtype checks collapse every numeric to 'NUMBER'
and catch nothing), sorts rows, and compares normalized cell values.
Normalization deliberately preserves the two seams:
  - int64 vs float64 (DuckDB SUM(BIGINT) -> HUGEINT -> float64)
  - object/Decimal vs float64 (raw DECIMAL in Spark output)
while equating representation-only differences the driver also
equates (datetime64 resolution, date vs midnight-timestamp).

Driver-side tooling only — never imported by the Scala engine.
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_dtype(dt):
    """Canonicalize dtypes the driver treats as identical: datetime64
    resolution (ns/us/ms) is a library-version artifact, and integer
    WIDTH is too (Spark INT -> int32 vs DuckDB's int64 passes the
    driver's hash on 12 r11-green keys). int-vs-float and
    object-vs-float remain seams — exactly the two classes the r11
    verdict root-caused."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"
    if s.startswith(("int", "uint")):
        return "int"
    return s


def norm_cell(v):
    import datetime, math, numpy as np
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def load_spark(files):
    """The driver's read path for our Verify output: pyarrow -> pandas.
    date_as_object=False so DATE columns land as datetime64, matching
    DuckDB .df()'s rendering of DATE (dates pass in the driver, so its
    loader must equate these too)."""
    tbl = pq.ParquetDataset(files).read()
    return tbl.to_pandas(date_as_object=False)


def sortable(df, key, side):
    """The driver sorts by all columns before hashing. Round-1 lesson:
    list cells raise `unhashable type: numpy.ndarray` there and void
    the query even when values match."""
    try:
        df.sort_values(by=list(df.columns), inplace=True,
                       ignore_index=True)
        return None
    except Exception as e:
        return f"{key}: pandas sort failed on {side} (driver comparer would too): {e}"


def rows_of(df):
    return [tuple(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        files = sorted(glob.glob(f"{out}/{key}/*.parquet"))
        if not files:
            print(f"FAIL {key}: no spark output")
            n_fail += 1
            continue
        try:
            mine = load_spark(files)
        except Exception as e:
            print(f"FAIL {key}: pyarrow read failed: {e}")
            n_fail += 1
            continue
        try:
            ref = con.execute(oracle[key]).df()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            n_fail += 1
            continue
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {key}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {key}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
            continue
        ty_bad = [(c, str(a), str(b))
                  for c, a, b in zip(mine.columns, mine.dtypes, ref.dtypes)
                  if norm_dtype(a) != norm_dtype(b)]
        if ty_bad:
            print(f"FAIL {key}: pandas dtype drift (spark vs oracle): {ty_bad}")
            n_fail += 1
            continue
        err = sortable(mine, key, "spark") or sortable(ref, key, "oracle")
        if err:
            print(f"FAIL {err}")
            n_fail += 1
            continue
        a_rows, b_rows = rows_of(mine), rows_of(ref)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(a_rows, b_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {key}: {len(bad)}/{len(a_rows)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"OK   {key} ({len(a_rows)} rows)")
    no_oracle = [k for k in sorted(glob.glob(f"{out}/*/"))
                 if k.rstrip('/').split('/')[-1] not in oracle]
    for k in no_oracle:
        print(f"     (no oracle: {k})")
    print(f"{'PREFLIGHT PASS' if n_fail == 0 else f'PREFLIGHT FAIL ({n_fail})'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
