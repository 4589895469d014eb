#!/usr/bin/env python
"""Local mimic of the driver's t2 duckdb-oracle correctness gate.

Runs every `queries()` entry from __spark_entry__ on Spark and its
`oracle_sql()` twin on DuckDB over the same parquet, then compares
row count + column names + order-insensitive values. Usage:

    python tools/check_correctness.py [sf0.001|sf0.01] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    import numpy as np

    # pandas cannot distinguish NULL from NaN in a float column (both sides
    # of the driver's compare materialize through pandas), so all null-ish
    # values collapse to one sentinel.
    if v is None or v is getattr(__import__("pandas"), "NaT", None):
        return "__NULL__"
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "__NULL__"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: rows may mix None with values, which plain tuple sort rejects
    out = sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)
    return [cols[i] for i in order], out


def main():
    sf = "sf0.001"
    only = []
    for a in sys.argv[1:]:
        if a.startswith("sf"):
            sf = a
        else:
            only.append(a)
    sf_dir = f"/root/testdata/{sf}"

    import duckdb

    import __spark_entry__ as entry
    from ocr_vector_db_spark.session import get_spark

    spark = get_spark("correctness_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from pyspark.sql import types as T

    # Types the driver's pandas canonicalizer cannot hash/sort (arrays) or
    # hashes at a different precision than DuckDB (nanos-vs-micros
    # timestamps). Inventory contract: scalar outputs only — encode
    # timestamps as epoch-us bigints and vectors as strings.
    BANNED_TYPES = (
        T.TimestampType, T.TimestampNTZType, T.ArrayType,
        T.MapType, T.BinaryType, T.StructType,
    )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = only or list(queries)
    passed = failed = skipped = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            bad = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in sdf.schema.fields
                if isinstance(f.dataType, BANNED_TYPES)
            ]
            if bad:
                print(f"FAIL  {name}: non-canonical output columns {bad} "
                      "(driver hashes raw values: emit epoch-us bigints / strings)")
                failed += 1
                continue
            # Materialize through pandas, like the driver: a nullable bigint
            # becomes float64 on BOTH sides, but a DuckDB HUGEINT becomes
            # float64 only on the oracle side — that asymmetry is what the
            # dtype-kind check below catches.
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
            skinds = {c: spdf[c].dtype.kind for c in spdf.columns}
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only: {len(srows)} rows) [{time.time()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetch_df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
            okinds = {c: odf[c].dtype.kind for c in ocols}
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failed += 1
            continue
        sc, sr = normalize_rows(scols, srows)
        oc, orr = normalize_rows(ocols, orows)
        msgs = []
        if sc != oc:
            msgs.append(f"columns differ: spark={sc} oracle={oc}")
        else:
            # The driver hashes pandas-materialized values: a DuckDB HUGEINT
            # (float64 via fetch_df) vs a Spark bigint hashes differently even
            # when every value is equal. Flag int-vs-float kind splits hard.
            for c in sc:
                ok, sk = okinds.get(c), skinds.get(c)
                if {ok, sk} == {"i", "f"}:
                    msgs.append(
                        f"dtype kind mismatch on {c}: spark={sk} oracle-pandas={ok} "
                        "(driver hash would differ — CAST the oracle column)"
                    )
        if len(sr) != len(orr):
            msgs.append(f"row count: spark={len(sr)} oracle={len(orr)}")
        if not msgs and sr != orr:
            n_bad = sum(1 for a, b in zip(sr, orr) if a != b)
            ex = next((a, b) for a, b in zip(sr, orr) if a != b)
            msgs.append(f"{n_bad}/{len(sr)} rows differ; first: spark={ex[0]} oracle={ex[1]}")
        if msgs:
            print(f"FAIL  {name}: " + " | ".join(msgs))
            failed += 1
        else:
            print(f"PASS  {name} ({len(sr)} rows) [{time.time()-t0:.1f}s]")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only, sf={sf}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
