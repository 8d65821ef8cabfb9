"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet dir, then compares
row count, column names, and an order-insensitive value hash (columns sorted
by name, rows sorted, values normalized). Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision, NO integral-float collapse — the driver hashes
        # repr(3.0) != repr(3); collapsing here hid the round-4 HUGEINT reds
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _pandas_rows(df, cols: list[str], dtypes: dict[str, str]) -> list[tuple]:
    """Rows as the driver sees them: DuckDB -> pandas -> Python scalars.

    numpy scalars unwrap via .item() (repr(np.float64(3.0)) is not '3.0' on
    numpy 2); pandas Timestamps go back to datetime, and DATE-typed columns
    back to date so they compare equal to Spark's DateType collect.
    """
    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for col, v in zip(cols, row):
            if v is None or v is pd.NaT:
                vals.append(None)
            elif isinstance(v, np.ndarray):
                vals.append(v.tolist())
            elif isinstance(v, bytearray):
                vals.append(bytes(v))
            elif hasattr(v, "to_pydatetime"):
                dt = v.to_pydatetime()
                vals.append(dt.date() if dtypes.get(col) == "DATE" else dt)
            elif hasattr(v, "item"):
                vals.append(v.item())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


def nonscalar_cols(schema) -> list[str]:
    """Top-level array/map/struct columns in a Spark schema — the types
    the driver's pandas `sort_values` canonicalizer cannot sort
    (unhashable list/dict cells). Registered queries must emit none."""
    return [f.name for f in schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")]


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from kafka_connect_streams_spark.engine import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            # driver-faithful: the driver pulls BOTH sides through pandas, so
            # a Spark NULL double and a DuckDB NULL double both become NaN;
            # .collect() (None) vs pandas (NaN) was a false asymmetry here
            sdtypes = {f.name: f.dataType.simpleString().upper()
                       for f in sdf.schema.fields}
            # hard gate (mirror of the HUGEINT DESCRIBE probe, on the SPARK
            # side): the driver canonicalizes via pandas sort_values over ALL
            # columns, and list/dict cells are unhashable -> TypeError before
            # any comparison runs (bpe_encode, round 10). Refuse non-scalar
            # output schemas locally so they cannot pass here and crash there.
            bad = nonscalar_cols(sdf.schema)
            if bad:
                print(f"FAIL  {name}: Spark output has non-scalar column(s) "
                      f"{bad} — the driver's pandas sort_values cannot sort "
                      f"array/map/struct cells; serialize to a scalar")
                failed.append(name)
                continue
            srows = _pandas_rows(sdf.toPandas(), scols, sdtypes)
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle; rows-only check)")
            continue
        try:
            # hard gate: DuckDB sum() over ints yields HUGEINT (int128); the
            # driver's pandas fetch turns that into float64 ("3" -> "3.0") and
            # the hash goes red even when values agree. Refuse such oracles.
            desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            huge = [d[0] for d in desc if "HUGEINT" in str(d[1]).upper()]
            if huge:
                print(f"FAIL  {name}: oracle has HUGEINT output column(s) "
                      f"{huge} — CAST to BIGINT (driver pandas-fetch trap)")
                failed.append(name)
                continue
            # symmetric non-scalar probe for the ORACLE side: a DuckDB
            # LIST/STRUCT/MAP output column reaches the driver's pandas
            # sort_values as unhashable cells exactly like a Spark array
            nonscalar = [d[0] for d in desc
                         if "[]" in str(d[1]) or
                         str(d[1]).upper().startswith(("STRUCT", "MAP"))]
            if nonscalar:
                print(f"FAIL  {name}: oracle has non-scalar output "
                      f"column(s) {nonscalar} — serialize to a scalar "
                      f"(driver sort_values trap)")
                failed.append(name)
                continue
            dtypes = {d[0]: str(d[1]).upper() for d in desc}
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            # driver-faithful fetch: through pandas, not fetchall() — the two
            # disagree on int128/date/decimal representation
            orows = _pandas_rows(res.df(), ocols, dtypes)
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duck={oh}")
                # show first diffs
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ss = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
                oo = sorted("|".join(_norm(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ss, oo):
                    if a != b:
                        problems.append(f"  first diff:\n   spark: {a}\n   duck : {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name}: rows={len(srows)}")
    print(json.dumps({"checked": len(queries if not only else only),
                      "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
