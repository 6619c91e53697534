#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on each oracle_sql.json statement (tables = parquet files in the
sf dir) and compares against the parquet dumped by `graft.Verify` —
column-name-sorted, row-sorted, value-by-value (exact; floats exact too,
since the engine is expected to produce bit-identical rounded doubles).

Also TYPE-sensitive (round-1 lesson): the driver's hash gate tags values with
their logical type, so a DuckDB HUGEINT (bare integer SUM) vs Spark BIGINT
mismatch hash-fails even when every value is equal. We compare the DuckDB
relation types of the oracle against the types DuckDB infers reading the
Spark parquet, column-name-sorted, and fail on any difference.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, gtypes = list(got.columns), [str(t) for t in got.types]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failed.append(name); continue
        try:
            want = con.sql(sql)
            wcols, wtypes = list(want.columns), [str(t) for t in want.types]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name); continue
        gc, gr = norm(grows, gcols)
        wc, wr = norm(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} oracle={wc}")
            failed.append(name); continue
        gt = dict(zip(gcols, gtypes))
        wt = dict(zip(wcols, wtypes))
        badty = [(c, gt[c], wt[c]) for c in gc if gt[c] != wt[c]]
        if badty:
            det = ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in badty)
            print(f"FAIL {name}: types differ ({det})")
            failed.append(name); continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(wr)}")
            failed.append(name); continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            print(f"     cols: {gc}")
            failed.append(name); continue
        print(f"OK   {name}: {len(gr)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
