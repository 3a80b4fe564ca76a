#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: load each
<outDir>/<name> parquet written by graft.Verify, run the matching
oracle_sql.json entry in DuckDB over the same sf tables, compare
(sorted columns by name, sorted rows, values)."""
import json, sys, glob, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.sql(oracle[name]).df())
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); ok = False
        else:
            for c in got.columns:
                a, b = got[c].tolist(), want[c].tolist()
                for i, (x, y) in enumerate(zip(a, b)):
                    same = (x == y) or (x is None and y is None) \
                        or (isinstance(x, float) and isinstance(y, float)
                            and (math.isnan(x) and math.isnan(y) or x == y))
                    # pandas uses NaN for nulls
                    if not same and not (pd.isna(x) and pd.isna(y)):
                        print(f"FAIL {name}: col {c} row {i}: {x!r} vs {y!r}")
                        ok = False; break
                if not ok: break
        if ok:
            print(f"ok   {name} ({len(got)} rows)")
        else:
            fails += 1
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
