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
    """Sign-aware scalar compare, STRICTER than the driver's hash. The
    driver hashes stringified values ("%.6f" for floats), under which
    -0.0 != +0.0 even though `x == y` holds — exactly the blindness
    that let c14 ship "green" in r15 and fail only at the driver's
    hash gate. Floats therefore compare EXACTLY (x == y) AND by sign
    bit: exact equality keeps the mirror's full sensitivity on columns
    the queries round at 7-8 decimals (a %.6f-rendering compare would
    have silently weakened those below their own stated precision),
    and the sign check catches the -0.0 class the driver's hash sees.
    Anything the mirror passes, the coarser %.6f driver hash passes."""
    if hasattr(x, "__len__") and not isinstance(x, str):
        # array-valued cell (pd.isna would be elementwise-ambiguous)
        return hasattr(y, "__len__") and len(x) == len(y) \
            and all(same_value(a, b) for a, b in zip(x, y))
    if pd.isna(x) and pd.isna(y):
        return True
    if isinstance(x, float) or isinstance(y, float):
        # mixed NUMERIC dtypes (one engine materializes int64, the
        # other double): coerce BOTH to float so -0.0 vs int 0 still
        # trips the sign check. Coercion is restricted to actual
        # numbers — float('0.5') on a STRING column would let a
        # genuine schema bug pass, weakening the mirror (r17 review
        # finding). bool is an int subclass; a bool-vs-float pair is
        # a schema bug, not a value match.
        if not (isinstance(x, (int, float)) and isinstance(y, (int, float))):
            return False
        if isinstance(x, bool) != isinstance(y, bool):
            return False
        fx, fy = float(x), float(y)
        if math.isnan(fx) and math.isnan(fy):
            return True
        return fx == fy and math.copysign(1.0, fx) == math.copysign(1.0, fy)
    return x == y

def selftest() -> int:
    assert not same_value(-0.0, 0.0), "mirror must flag -0.0 vs +0.0"
    assert same_value(0.0, 0.0)
    assert same_value(-0.0, -0.0)
    assert same_value(float("nan"), float("nan"))
    # exact compare: sub-%.6f drift the driver's hash would MISS still
    # fails here (the mirror is strictly stricter, never weaker)
    assert not same_value(1.0000004, 1.0000001)
    assert not same_value(1.000001, 1.000002)
    assert same_value("a", "a") and not same_value("a", "b")
    assert same_value(None, None)
    # mixed dtype: int64 0 vs float -0.0 must still trip the sign bit
    assert not same_value(-0.0, 0), "mixed-dtype -0.0 vs int 0 must fail"
    assert not same_value(0, -0.0), "mixed-dtype int 0 vs -0.0 must fail"
    assert same_value(0, 0.0) and same_value(3, 3.0)
    assert not same_value("x", 0.0) and not same_value(True, 1.0)
    # numeric STRINGS must not coerce — a string column matching a
    # double column is a schema bug the mirror must catch
    assert not same_value("0.5", 0.5) and not same_value(0.5, "0.5")
    print("selftest ok (signed-zero distinguished, exact float compare)")
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
