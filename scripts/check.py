#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against the sf tables,
then compares: row count, column names, and value hash (columns sorted
by name, rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Sort on the NORMALIZED string form: raw-float sorts can order rows
    # differently between engines when values differ only in low-order
    # bits, and raw sorts raise on array-valued cells (embeddings).
    norm = df.map(norm_cell)
    df = df.iloc[norm.sort_values(by=list(norm.columns)).index].reset_index(drop=True)
    return df

def norm_cell(v):
    import datetime, numpy as np
    # Type-tag numerics: the driver's hasher distinguishes an int-typed
    # cell from a float-typed one (a DuckDB HUGEINT output column
    # materializes as float64 in pandas, so an uncast integer aggregate
    # hashes "3.0" against Spark's "3" and FAILS there). Folding 3.0≡3
    # here masked exactly that class (q_mix_unimax, round 11) — so
    # float cells get a "f:" prefix and ints normalize through int().
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return repr(bool(v))
    if isinstance(v, float):
        if v == 0:
            return "f:0"  # fold -0.0 and 0.0 together across engines
        return "f:" + f"{v:.10g}"
    if isinstance(v, int) or isinstance(v, np.integer):
        return "i:" + str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)

def digest(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def selftest():
    """The fixture that would have caught the round-11 q_mix_unimax
    miss: an int-typed engine column vs a float64 oracle column with
    numerically identical values MUST hash differently."""
    a = pd.DataFrame({"k": [1, 2], "n": pd.array([3, 4], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "n": pd.array([3.0, 4.0], dtype="float64")})
    assert digest(canon(a)) != digest(canon(b)), \
        "int vs float column folded together — driver hasher is stricter"
    c = pd.DataFrame({"k": [1, 2], "n": pd.array([3.0, 4.0], dtype="float64")})
    assert digest(canon(b)) == digest(canon(c)), "float/float must agree"
    print("selftest OK")

def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        sdf = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            odf = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = []
        if list(sdf.columns) != list(odf.columns):
            problems.append(f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
        if len(sdf) != len(odf):
            problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        if not problems and digest(sdf) != digest(odf):
            diff_idx = None
            for i in range(len(sdf)):
                a = [norm_cell(v) for v in sdf.iloc[i]]
                b = [norm_cell(v) for v in odf.iloc[i]]
                if a != b:
                    diff_idx = i
                    problems.append(f"hash mismatch, first diff row {i}:\n  spark : {a}\n  oracle: {b}")
                    break
            if diff_idx is None:
                problems.append("hash mismatch (normalization-level)")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
