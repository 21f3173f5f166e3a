#!/usr/bin/env python3
"""Dev-only harness (NOT part of the engine): replicate the driver's
DuckDB-oracle compare against a graft.Verify output directory.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query directory <out>/<name>/ (spark parquet) and its oracle SQL
from <out>/oracle_sql.json, run the SQL in DuckDB over the sf parquet
tables, then compare as unordered multisets: columns sorted by name,
rows sorted, exact cell equality (floats compared exactly — queries are
expected to round on both sides).
"""
import sys, os, json, glob
import duckdb

def norm(v):
    if isinstance(v, float):
        # exact representation; queries must round on both sides
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir-parquet (AdaptiveGate data)
            p = f"{p}/*.parquet"
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # The q47/q59/q130 oracles share one expensive recursive-walk prefix
    # (DedupOps.q47WalkCtesFor) that is byte-identical by construction;
    # running it three times was the adaptive gate's long pole. Detect
    # identical prefixes ending at the `clus` CTE, materialize the walk
    # ONCE as a temp table, and rewrite each sharer to start from it.
    walk_end = "min(lab) AS cluster_id FROM walk GROUP BY id)"
    prefixes = {}
    for name, sql in oracle.items():
        i = sql.find(walk_end)
        if i >= 0:
            prefixes.setdefault(sql[:i + len(walk_end)], []).append(name)
    for k, (prefix, sharers) in enumerate(p for p in prefixes.items()
                                          if len(p[1]) > 1):
        tmp = f"clus_shared_{k}"
        try:
            con.execute(f"CREATE TEMP TABLE {tmp} AS {prefix}\n"
                        f"SELECT doc_id, cluster_id FROM clus")
        except Exception as e:
            print(f"walk-cache skipped ({e})"); continue
        for name in sharers:
            oracle[name] = (f"WITH clus AS (SELECT * FROM {tmp})"
                            + oracle[name][len(prefix):])
        print(f"walk-cache: {tmp} shared by {sorted(sharers)}")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        gcols = sorted(got.column_names)
        grows = sorted(tuple(norm(r[c]) for c in gcols)
                       for r in got.to_pylist())
        # the DRIVER's harness (pandas sort_values over all columns)
        # crashes on array/list cells ("unhashable type: numpy.ndarray",
        # the r3/r4 q55 failure) — this repr-based compare does not, so
        # flag list columns as failures here before the driver sees them
        listy = [f.name for f in got.schema
                 if str(f.type).startswith(("list", "large_list", "fixed_size_list"))]
        if name in oracle and listy:
            print(f"FAIL {name}: list-typed columns {listy} are "
                  f"driver-unhashable — emit scalar/CSV cells"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(grows)} rows)"); continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ecols = sorted(exp.column_names)
        erows = sorted(tuple(norm(r[c]) for c in ecols)
                       for r in exp.to_pylist())
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}"); n_fail += 1
        elif grows != erows:
            diff_g = [r for r in grows if r not in set(erows)][:3]
            diff_e = [r for r in erows if r not in set(grows)][:3]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows; "
                  f"spark-only={diff_g} oracle-only={diff_e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
