#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (DuckDB oracle compare).

Usage: python3 tools/localcheck.py [--exact] <sfDir> <outDir> [query ...]

Reads outDir/<name>/ parquet written by graft.Verify, runs the matching
oracle SQL from outDir/oracle_sql.json in DuckDB over the sfDir parquet
tables, sorts columns by name, and compares row-by-row (exact for
non-floats, 1e-9 relative for floats). --exact disables the float
tolerance, mimicking the driver's bit-exact hash compare — floats that
pass the default mode but fail --exact are last-ulp evaluation-order
divergences (e.g. a double window sum under DuckDB's segment-tree
summation) and WILL fail the driver gate. Dev tool only — the real gate
is driver-side.
"""
import sys, json, math, glob, struct
import duckdb

def bits(x):
    """IEEE-754 bytes of a float: distinguishes -0.0 from 0.0 (and any
    other same-value different-repr pair the driver's stringified hash
    would treat as different)."""
    return struct.pack('d', x)

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    args = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        # Driver testdata is one file per table; Spark-written scale-up
        # dirs (HeadroomGen output) are directories of part files.
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle) if not only else sorted(only & set(oracle))
    fails = 0
    for name in names:
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); fails += 1; continue
            spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ora = con.sql(oracle[name])
            scols, ocols = sorted(spark.columns), sorted(ora.columns)
            if [c.lower() for c in scols] != [c.lower() for c in ocols]:
                print(f"FAIL {name}: schema {scols} vs {ocols}"); fails += 1; continue
            sdf, odf = spark.df()[scols], ora.df()[ocols]
            # Driver hash-compares stringified values exactly: an int64
            # Spark column vs a HUGEINT oracle column (pandas float64)
            # hash-mismatches even when numerically identical. DuckDB
            # sum(INTEGER) widens to HUGEINT -> CAST(... AS BIGINT).
            rep = [sc for sc, oc in zip(scols, ocols)
                   if {sdf[sc].dtype.kind, odf[oc].dtype.kind} == {"i", "f"}]
            if rep:
                print(f"FAIL {name}: int-vs-float representation mismatch on "
                      f"{rep} (CAST oracle aggregate to BIGINT?)")
                fails += 1; continue
            srows = sdf.values.tolist()
            orows = odf.values.tolist()
            if len(srows) != len(orows):
                print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}"); fails += 1; continue
            bad = None
            for i, (a, b) in enumerate(zip(srows, orows)):
                for x, y in zip(a, b):
                    # pandas NaT/None nulls: x != y is True for NaT pairs
                    if (x is None or str(x) == 'NaT') and (y is None or str(y) == 'NaT'):
                        continue
                    if isinstance(x, float) or isinstance(y, float):
                        both_nan = (isinstance(x, float) and isinstance(y, float)
                                    and math.isnan(x) and math.isnan(y))
                        if both_nan:
                            continue
                        if exact:
                            if not (isinstance(x, float) and isinstance(y, float)
                                    and bits(x) == bits(y)) and x != y:
                                bad = (i, x, y); break
                            if (isinstance(x, float) and isinstance(y, float)
                                    and bits(x) != bits(y)):
                                bad = (i, x, y); break
                        elif x != y and not (isinstance(x,(int,float)) and isinstance(y,(int,float))
                                           and math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-12)):
                            bad = (i, x, y); break
                    elif x != y:
                        bad = (i, x, y); break
                if bad: break
            if bad:
                print(f"FAIL {name}: row {bad[0]}: {bad[1]!r} != {bad[2]!r}"); fails += 1
            else:
                print(f"PASS {name}: {len(srows)} rows")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
