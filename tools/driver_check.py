"""Simulate the driver's CORRECTNESS gate (default sf0.01; override dir via GRAFT_CHECK_SF)."""
import os, sys, time
import duckdb, pandas as pd, pyarrow as pa
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as em

SF = os.environ.get("GRAFT_CHECK_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f": df[c] = df[c].round(6)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), ignore_index=True)

qs, os_ = em.queries(), em.oracle_sql()
fails = []
only = set(sys.argv[1:])  # optional name filter: run a subset
for name in sorted(qs):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = qs[name](SF)
        got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    except Exception as e:
        fails.append((name, f"RAY ERROR {type(e).__name__}: {e}")); print(f"{name:28s} RAY-ERR"); continue
    sql = os_.get(name)
    if sql is None:
        print(f"{name:28s} rows-only {len(got):7d}  {time.time()-t0:5.1f}s"); continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"SQL ERROR: {e}")); print(f"{name:28s} SQL-ERR"); continue
    status = "OK"
    if len(got) != len(want): status = f"ROWCOUNT {len(got)} vs {len(want)}"
    else:
        g, w = norm(got), norm(want)
        if sorted(g.columns) != sorted(w.columns): status = f"COLS {list(g.columns)} vs {list(w.columns)}"
        else:
            for c in g.columns:
                gc, wc = g[c], w[c]
                if gc.dtype.kind == "f" or wc.dtype.kind == "f":
                    if ((gc.astype(float)-wc.astype(float)).abs().max() or 0) >= 1e-5:
                        status = f"FLOAT {c}"; break
                elif gc.astype(str).tolist() != wc.astype(str).tolist():
                    status = f"VALUES {c}"; break
            # dtype check (driver compares schema)
            for c in g.columns:
                if status != "OK": break
                if str(got[sorted(got.columns).index(c) if False else c].dtype if False else got[c].dtype) != str(want[c].dtype):
                    status = f"DTYPE {c}: {got[c].dtype} vs {want[c].dtype}"
    if status != "OK": fails.append((name, status))
    print(f"{name:28s} {status:30s} {len(got):7d} rows {time.time()-t0:5.1f}s")
print("\nFAILURES:", len(fails))
for n, s in fails: print(" -", n, s)
ray.shutdown()
