"""Build the NULL-text oracle-parity fixture.

Copies an sf dir into a new fixture dir, replacing documents.parquet with
the same rows PLUS three policy probes: a NULL-text doc, an empty-text doc,
and a whitespace-only doc. The repo-wide policy is NULL text ≡ empty
document (Spark's _tok_array coalesces NULL to ''; quality gates must fail
NULL docs as "no tokens", not pass them because NULL comparisons are all
unknown). Running tools/check.py against this fixture verifies every
Spark/DuckDB oracle pair implements the policy IDENTICALLY on both sides —
the round-5 advisor found the policy applied to Spark but not to several
oracles, latent only because the generated testdata has no NULL texts.

    python tools/make_nulltext_fixture.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def build(src: str, out: str) -> str:
    src_p, out_p = Path(src), Path(out)
    out_p.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(src_p / f"{t}.parquet", out_p / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT * FROM '{src_p}/documents.parquet'
            UNION ALL BY NAME
            SELECT * FROM (VALUES
                (1000001, NULL, 'en', 'probe', 0),
                (1000002, '',   'en', 'probe', 0),
                (1000003, '   ','en', 'probe', 3))
                AS probes(doc_id, text, lang, source, n_chars)
        ) TO '{out_p}/documents.parquet' (FORMAT PARQUET)
    """)
    return str(out_p)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fixture_nulltext"
    print(build(src, out))
