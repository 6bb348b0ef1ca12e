"""Driver-style CORRECTNESS preflight: run every driver-window query at
sf0.01 (the driver's scale) and compare against its SQL oracle with the
driver's sorted-column, dtype-strict compare. Run from /root/repo:

    python scripts/driver_preflight.py [sf_dir]

Run this after ANY queries() registry reorder, and never while editing
library files (Ray workers re-import the module tree from disk
mid-run)."""
import ray, logging, duckdb, json, sys
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
sys.path.insert(0, "/root/repo")
from go_logagent_ray.pipelines.queries import QUERIES, ORACLE_SQL
import pandas as pd

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"): df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("uint"): df[c] = df[c].astype("int64", errors="ignore")
    return df.sort_values(list(df.columns)).reset_index(drop=True)

res = {}
for name, fn in QUERIES.items():
    try:
        got = fn(SF)
        got = norm(got.to_pandas() if hasattr(got, "to_pandas") else got)
        if name not in ORACLE_SQL:
            res[name] = {"rows": len(got), "oracle": None}
            continue
        exp = norm(con.sql(ORACLE_SQL[name]).df())
        ok_cols = list(got.columns) == list(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = False
        if ok_cols and ok_rows:
            ok_vals = True
            for c in got.columns:
                a, b = got[c], exp[c]
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    import math
                    if not all((math.isnan(x) and math.isnan(y)) or abs(x-y) <= 1e-6
                               for x, y in zip(a.astype(float), b.astype(float))):
                        ok_vals = False; break
                elif not (a.astype(str).values == b.astype(str).values).all():
                    ok_vals = False; break
        res[name] = {"rows": len(got), "oracle_rows": len(exp),
                     "cols": ok_cols, "rows_match": ok_rows, "vals": ok_vals}
        if not (ok_cols and ok_rows and ok_vals):
            print("MISMATCH", name, res[name], flush=True)
    except Exception as e:
        res[name] = {"error": repr(e)[:200]}
        print("ERROR", name, repr(e)[:200], flush=True)
bad = {k: v for k, v in res.items() if v.get("error") or (("vals" in v) and not v["vals"])}
print(json.dumps({"total": len(res), "bad": bad}))
ray.shutdown()
