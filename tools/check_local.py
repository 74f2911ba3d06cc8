#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB against the same sf dir, and compare
(columns sorted by name, rows sorted, exact value equality with float
diffs reported). Usage: check_local.py <sfDir> <verifyOutDir>"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        # Driver's hash compare is type/repr-sensitive: e.g. DuckDB widens
        # sum(BIGINT) to HUGEINT, which pandas renders as float64, so an
        # int64 spark column hash-mismatches even when values are equal
        # (bit us on q_seq_pack in r02). Flag dtype-KIND mismatches
        # (int vs float vs object vs datetime) even when values compare.
        tmis = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                for c in scols if sdf[c].dtype.kind != odf[c].dtype.kind]
        if tmis:
            print(f"FAIL {name}: dtype-kind mismatch {tmis}")
            n_fail += 1
            continue
        s = sdf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
        o = odf[ocols].sort_values(ocols, kind="mergesort").reset_index(drop=True)
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        mismatches = []
        for c in scols:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                a, b = norm(a), norm(b)
                if a is None and b is None:
                    continue
                try:
                    import pandas as pd
                    if pd.isna(a) and pd.isna(b):
                        continue
                except (TypeError, ValueError):
                    pass
                if a != b:
                    mismatches.append((c, i, a, b))
                    if len(mismatches) >= 5:
                        break
            if len(mismatches) >= 5:
                break
        if mismatches:
            print(f"FAIL {name}: {len(s)} rows, first diffs:")
            for c, i, a, b in mismatches:
                print(f"    col={c} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
