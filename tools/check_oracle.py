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

def same_value(x, y) -> bool:
    """Driver-parity scalar compare. The driver hashes STRINGIFIED
    values ("%.6f" for floats), under which -0.0 != +0.0 even though
    `x == y` holds — exactly the blindness that let c14 ship "green"
    in r15 and fail only at the driver's hash gate. Floats therefore
    compare by their %.6f rendering (sign included)."""
    if hasattr(x, "__len__") and not isinstance(x, str):
        # array-valued cell (pd.isna would be elementwise-ambiguous)
        return hasattr(y, "__len__") and len(x) == len(y) \
            and all(same_value(a, b) for a, b in zip(x, y))
    if pd.isna(x) and pd.isna(y):
        return True
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return ("%.6f" % x) == ("%.6f" % y)
    return x == y

def selftest() -> int:
    assert not same_value(-0.0, 0.0), "mirror must flag -0.0 vs +0.0"
    assert same_value(0.0, 0.0)
    assert same_value(-0.0, -0.0)
    assert same_value(float("nan"), float("nan"))
    assert same_value(1.0000004, 1.0000001)   # same %.6f bucket as the driver
    assert not same_value(1.000001, 1.000002)
    assert same_value("a", "a") and not same_value("a", "b")
    assert same_value(None, None)
    print("selftest ok (signed-zero distinguished, driver %.6f parity)")
    return 0

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
                    if not same_value(x, y):
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
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
