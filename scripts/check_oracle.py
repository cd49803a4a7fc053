"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet,
compare row count + sorted column names + order-insensitive value hash.

Usage: python scripts/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

--json writes a driver-artifact-shaped report (one row per registered
query: rows/schema/hash match flags + row counts) so the committed
CORRECTNESS file can always cover every queries() entry, even ones
registered after the driver's own run.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if s.dtype.kind in "fc":
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    def canon(x):
        # stringly-typed so mixed null/float/str columns stay sortable
        if x is None or (isinstance(x, float) and pd.isna(x)) or x is pd.NaT:
            return "<NULL>"
        if isinstance(x, (float, np.floating)):
            return repr(round(float(x), 6))
        return repr(x)

    rows = sorted(
        tuple(canon(x) for x in row)
        for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), cols, h


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from raster2dggs_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark:{type(e).__name__}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only) [{time.time()-t0:.1f}s]")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": "no_oracle"}
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": f"duckdb:{e}"}
            n_fail += 1
            continue
        sn, sc, sh = norm_hash(sdf)
        on, oc, oh = norm_hash(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        report[name] = {"rows_match": sn == on, "schema_match": sc == oc,
                        "hash_match": sh == oh, "spark_rows": sn,
                        "oracle_rows": on, "err": None}
        if ok:
            print(f"PASS  {name}: {sn} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {sn} vs {on}; cols {sc == oc}; hash {sh == oh}")
            if sc != oc:
                print(f"      spark cols {sc}\n      oracle cols {oc}")
            elif sn == on:
                # show first differing rows
                a = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
                b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                for i in range(min(len(a), len(b))):
                    if not a.iloc[i].equals(b.iloc[i]):
                        print(f"      first diff row {i}:\n      spark  {a.iloc[i].to_dict()}\n      oracle {b.iloc[i].to_dict()}")
                        break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
