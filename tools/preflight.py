#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (SURVEY.md §5.1).

Usage: preflight.py <sfDir> <verifyOutDir> [key ...]

Reads each <verifyOutDir>/<key>/ parquet (our Verify.scala dump), runs the
paired SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet, and
compares: schema (column names sorted), row count, and exact cell values
(repr-level, i.e. bit-exact floats). Exit 1 if any query mismatches.

Driver-side tooling only — never imported by the Scala engine.
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime, math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    types = [str(d[1]) for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [
        tuple(norm_cell(r[i]) for i in order) for r in rows], \
        [types[i] for i in order]


def pandas_sortable(con, sql, key):
    """Replicate the driver's comparer: pandas load + sort by all
    columns. Round-1 lesson: list cells raise `unhashable type:
    numpy.ndarray` there and void the query even when values match."""
    try:
        df = con.execute(sql).df()
        df.sort_values(by=list(df.columns), inplace=True)
        return None
    except Exception as e:
        return f"{key}: pandas sort failed (driver comparer would too): {e}"


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
        spark_sql = f"SELECT * FROM read_parquet({files!r})"
        mine_cols, mine, mine_ty = fetch(con, spark_sql)
        try:
            ref_cols, ref, ref_ty = fetch(con, oracle[key])
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if mine_cols != ref_cols:
            print(f"FAIL {key}: columns {mine_cols} != {ref_cols}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {key}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
            continue
        # dtype drift breaks the driver's pandas hash even when repr
        # values match (round-1 lesson: DuckDB SUM(BIGINT) -> HUGEINT
        # becomes a different pandas dtype than Spark's int64).
        ty_bad = [(c, a, b) for c, a, b in zip(mine_cols, mine_ty, ref_ty)
                  if a != b]
        err = (pandas_sortable(con, spark_sql, key)
               or pandas_sortable(con, oracle[key], key))
        if err:
            print(f"FAIL {err}")
            n_fail += 1
            continue
        if ty_bad:
            print(f"FAIL {key}: dtype drift (spark vs oracle): {ty_bad}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(mine, ref)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {key}: {len(bad)}/{len(mine)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"OK   {key} ({len(mine)} rows)")
    no_oracle = [k for k in sorted(glob.glob(f"{out}/*/"))
                 if k.rstrip('/').split('/')[-1] not in oracle]
    for k in no_oracle:
        print(f"     (no oracle: {k})")
    print(f"{'PREFLIGHT PASS' if n_fail == 0 else f'PREFLIGHT FAIL ({n_fail})'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
