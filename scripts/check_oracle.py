#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same scale-factor tables and compare row count, column names, and a
hash of the sorted values. Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings; floats rounded to tolerate engine noise
    def cell(v):
        if v is None or v != v:
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            results[name] = f"NO_OUTPUT {e}"
            continue
        if list(got.columns) == ["_error"]:
            # Verify's explicit crash marker (see Verify.scala): the query
            # raised instead of producing rows — surface the message verbatim
            msg = got["_error"].iloc[0] if len(got) else "<no message>"
            results[name] = f"ERR {msg}"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        problems = []
        if sorted(map(str.lower, got.columns)) != sorted(map(str.lower, exp.columns)):
            problems.append(f"cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rows spark={len(got)} oracle={len(exp)}")
        if not problems:
            got.columns = [c.lower() for c in got.columns]
            exp.columns = [c.lower() for c in exp.columns]
            if canon(got) != canon(exp):
                problems.append("hash mismatch")
                merged = got.merge(exp, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                if len(diff) and len(diff) < 20:
                    problems.append(diff.to_string()[:2000])
        results[name] = "OK" if not problems else "FAIL " + "; ".join(problems)
    missing = [q for q in oracle if q not in names]
    for q in missing:
        results[q] = "MISSING_OUTPUT"
    bad = 0
    for k in sorted(results):
        status = results[k]
        flag = "✓" if status.startswith(("OK", "ROWS_ONLY")) else "✗"
        if flag == "✗":
            bad += 1
        print(f"{flag} {k}: {status[:500]}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
