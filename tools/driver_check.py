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
        if df[c].dtype == object and len(df):
            # detect bytes from the first NON-NULL value (row 0 alone
            # misclassifies nullable binary columns) and skip nulls in
            # the map so a null row can't crash the whole gate
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], (bytes, bytearray)):
                df[c] = df[c].map(
                    lambda b: bytes(b).hex(), na_action="ignore"
                )
    return df.sort_values(list(df.columns), ignore_index=True)


def offgrid(df, decimals=6):
    """Columns whose floats do NOT sit on the round-`decimals` grid.
    Published floats are contractually pre-rounded on both engines; a
    raw (unrounded) float column is the remaining driver-hash risk
    class (VERDICT r3 #2) — numpy and DuckDB raw float paths diverge
    at ulp level. Tolerance = float64 representation error of a
    stored grid point: v = k/10^d rounds once, v*10^d rounds again,
    so |f - k| <= |f| * ~4.5e-16; 5e-15 leaves slack without ever
    reaching the max grid distance 0.5 below |v| ~= 1e8 (the r5
    review found the old 1e-12 went vacuous already at |v| ~= 5e5 —
    above ~1e8 the detector is INHERENTLY blind, integer-valued
    doubles that large are all within 0.5 of the grid)."""
    import numpy as np
    bad = []
    for c in df.columns:
        if df[c].dtype.kind != "f":
            continue
        v = df[c].to_numpy(dtype=float)
        v = v[np.isfinite(v)]
        if not len(v):
            continue
        f = v * (10.0 ** decimals)
        d = np.abs(f - np.rint(f))
        tol = np.maximum(np.abs(f), 1.0) * 5e-15
        n = int((d > tol).sum())
        if n:
            bad.append(f"{c}:{n}")
    return bad

qs, os_ = em.queries(), em.oracle_sql()
fails = []
warns = []
only = set(sys.argv[1:])  # optional name filter: run a subset
unknown = only - set(qs)
if unknown:
    # a typo must not produce a vacuously green gate (r5 review)
    sys.exit(f"unknown query name(s): {sorted(unknown)}")
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
            import numpy as np
            for c in g.columns:
                gc, wc = g[c], w[c]
                if gc.dtype.kind == "f" or wc.dtype.kind == "f":
                    # EXACT BITWISE equality — the driver hashes value
                    # bit patterns; IEEE == would pass -0.0 vs 0.0 and
                    # any float divergence at all is a hash fail (the
                    # old 1e-5 tolerance masked the r3 lm_nll
                    # knife-edge; the r5 review closed the signed-zero
                    # gap). Bit compare also equates identical NaNs.
                    a = np.ascontiguousarray(gc.to_numpy(dtype=float))
                    b = np.ascontiguousarray(wc.to_numpy(dtype=float))
                    same = a.view(np.int64) == b.view(np.int64)
                    if not same.all():
                        i = int(np.flatnonzero(~same)[0])
                        status = f"FLOAT {c} [{i}]: {a[i]!r} vs {b[i]!r}"; break
                elif gc.astype(str).tolist() != wc.astype(str).tolist():
                    status = f"VALUES {c}"; break
            # dtype check (driver compares schema) — runs even when an
            # offgrid warn will decorate the status below (the r4a bug:
            # the warn set status != "OK" first and short-circuited
            # this loop, silently skipping dtype checks for any entry
            # with a raw-float column)
            if status == "OK":
                for c in g.columns:
                    if str(got[c].dtype) != str(want[c].dtype):
                        status = f"DTYPE {c}: {got[c].dtype} vs {want[c].dtype}"; break
            if status == "OK":
                og = offgrid(got)
                if og:
                    warns.append((name, f"OFFGRID {','.join(og)}"))
                    status = f"OK (offgrid warn: {','.join(og)})"
    if not status.startswith("OK"): fails.append((name, status))
    print(f"{name:28s} {status:30s} {len(got):7d} rows {time.time()-t0:5.1f}s")
print("\nOFFGRID WARNINGS:", len(warns))
for n, s in warns: print(" ~", n, s)
print("\nFAILURES:", len(fails))
for n, s in fails: print(" -", n, s)
ray.shutdown()
sys.exit(1 if fails else 0)
