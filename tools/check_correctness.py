"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB query at a given sf dir and compares
row-count + column set + order-insensitive values (exact for
ints/strings, bit-exact for doubles with a reported max-abs-diff on
mismatch). Lets us know a query will pass BEFORE the driver runs it.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        k = out[c].dtype.kind
        if k in "iu":
            out[c] = out[c].astype("int64")
        elif k == "f":
            out[c] = out[c].astype("float64")
        elif k == "M":
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
        elif k == "O":
            try:
                if len(out) and isinstance(out[c].iloc[0], (bytes, bytearray)):
                    out[c] = out[c].apply(bytes.hex)
            except Exception:
                pass
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(name: str, s: pd.DataFrame, o: pd.DataFrame) -> bool:
    if set(s.columns) != set(o.columns):
        print(f"  [{name}] FAIL columns: spark={sorted(s.columns)} oracle={sorted(o.columns)}")
        return False
    if len(s) != len(o):
        print(f"  [{name}] FAIL rows: spark={len(s)} oracle={len(o)}")
        return False
    cs, co = canon(s), canon(o)
    ok = True
    for c in cs.columns:
        a, b = cs[c].to_numpy(), co[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af, bf = a.astype("float64"), b.astype("float64")
            same = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not same.all():
                d = np.abs(af - bf)
                print(
                    f"  [{name}] FAIL col {c}: {int((~same).sum())}/{len(a)} differ, "
                    f"max|d|={np.nanmax(d):.3e}"
                )
                ok = False
        else:
            same = pd.Series(a).astype(str).eq(pd.Series(b).astype(str))
            if not same.all():
                i = int(np.argmax(~same.to_numpy()))
                print(
                    f"  [{name}] FAIL col {c}: {int((~same).sum())}/{len(a)} differ, "
                    f"first: spark={a[i]!r} oracle={b[i]!r}"
                )
                ok = False
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from geomesa_spark.session import build_session

    spark = build_session(cores=8, app="check")
    qs, oq = e.queries(), e.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s = sdf.toPandas()
        except Exception:
            print(f"  [{name}] SPARK ERROR:\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oq:
            print(f"  [{name}] rows-only: {len(s)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            o = con.execute(oq[name]).df()
        except Exception:
            print(f"  [{name}] ORACLE ERROR:\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if compare(name, s, o):
            print(f"  [{name}] OK  {len(s)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
