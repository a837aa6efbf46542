"""Self-check: run queries()[name] vs oracle_sql()[name] on a sf dir,
mirroring the driver's compare (sort columns by name, sort rows, hash
values).  Usage:

    python scripts/selfcheck.py [--sf /root/testdata/sf0.01] name [name...]
    python scripts/selfcheck.py --all          # every oracled pipeline
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(x):
    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    try:  # ray Dataset
        return x.to_pandas()
    except Exception:
        raise TypeError(type(x))


def canon(df: pd.DataFrame) -> tuple[int, str, str]:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    schema = ",".join(f"{c}:{df[c].dtype.kind}" for c in df.columns)
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            vals = [repr(round(float(v), 9)) if pd.notna(v) else "NaN"
                    for v in col]
        else:
            vals = [repr(v) for v in col]
        h.update(("|".join(vals)).encode())
    return len(df), schema, h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as ent
    q, o = ent.queries(), ent.oracle_sql()
    names = sorted(o) if args.all else args.names

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')")

    fails = []
    for name in names:
        if name not in q:
            print(f"{name}: NOT IN queries()"); fails.append(name); continue
        t0 = time.time()
        try:
            mine = to_pandas(q[name](args.sf))
        except Exception as e:
            print(f"{name}: RAY FAIL {type(e).__name__}: {e}")
            fails.append(name); continue
        t1 = time.time()
        if name not in o:
            print(f"{name}: rows-only ({len(mine)} rows, {t1-t0:.2f}s)")
            continue
        try:
            orc = con.execute(o[name]).fetch_df()
        except Exception as e:
            print(f"{name}: ORACLE FAIL {type(e).__name__}: {e}")
            fails.append(name); continue
        rm, sm, hm = canon(mine)
        ro, so, ho = canon(orc)
        ok = (rm == ro) and (sm == so) and (hm == ho)
        status = "OK" if ok else "MISMATCH"
        print(f"{name}: {status} rows={rm}/{ro} "
              f"schema={'=' if sm == so else sm + ' vs ' + so} "
              f"hash={'=' if hm == ho else '≠'} ({t1-t0:.2f}s)")
        if not ok:
            fails.append(name)
            if rm and ro and sm == so:
                mm = to_pandas(q[name](args.sf))[sorted(mine.columns)]
                mm = mm.sort_values(list(mm.columns)).reset_index(drop=True)
                oo = orc[sorted(orc.columns)]
                oo = oo.sort_values(list(oo.columns)).reset_index(drop=True)
                print("  mine head:\n", mm.head(5).to_string())
                print("  orcl head:\n", oo.head(5).to_string())
    print(f"\n{len(names) - len(fails)}/{len(names)} ok")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
