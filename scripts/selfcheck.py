"""Self-check: run queries()[name] vs oracle_sql()[name] on a sf dir,
mirroring the driver's compare (sort columns by name, sort rows, hash
values).  Usage:

    python scripts/selfcheck.py [--sf /root/testdata/sf0.01] name [name...]
    python scripts/selfcheck.py --all          # every oracled pipeline
    python scripts/selfcheck.py --all --chunked 40   # fresh Ray session
                                                     # per 40 pipelines

``--chunked`` runs each chunk in a fresh subprocess/Ray session (the
bench protocol-4 pattern): Ray 2.49's task-manager race
(task_manager.cc:930) can kill any single long-lived session after a
few hundred datasets, so the full 300-pipeline sweep needs session
rotation to finish deterministically.  A chunk that dies without
reporting per-name results is retried once before its names count as
failures."""
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


def run_chunked(sf: str, names: list[str], chunk: int) -> int:
    import os
    import subprocess

    total_ok = 0
    all_fails: list[str] = []
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        for attempt in (1, 2):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--sf", sf] + part
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=1800, cwd="/root/repo")
                out, rc = r.stdout, r.returncode
            except subprocess.TimeoutExpired as e:
                out = (e.stdout or b"").decode() \
                    if isinstance(e.stdout, bytes) else (e.stdout or "")
                rc = 124
            sys.stdout.write(out)
            sys.stdout.flush()
            per_name = [ln for ln in out.splitlines()
                        if ln.split(":")[0] in part]
            if len(per_name) == len(part) or attempt == 2:
                oks = sum(1 for ln in per_name
                          if ": OK" in ln or ": rows-only" in ln)
                total_ok += oks
                all_fails += [ln.split(":")[0] for ln in per_name
                              if ": OK" not in ln
                              and ": rows-only" not in ln]
                all_fails += [n for n in part
                              if not any(ln.startswith(n + ":")
                                         for ln in per_name)]
                break
            print(f"[chunk {i//chunk}] died mid-chunk (rc={rc}"
                  f", {len(per_name)}/{len(part)} reported) — retrying "
                  "in a fresh session", flush=True)
    print(f"\n{len(names) - len(all_fails)}/{len(names)} ok (chunked)")
    if all_fails:
        print("fails:", sorted(set(all_fails)))
    return 1 if all_fails else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--chunked", type=int, default=0,
                    help="run N pipelines per fresh subprocess session")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.chunked:
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as ent
        names = sorted(ent.oracle_sql()) if args.all else args.names
        return run_chunked(args.sf, names, args.chunked)

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
