"""NULL-text oracle-parity gate.

The repo-wide policy is NULL text ≡ empty document (operators/text.py
_tok_array). The generated testdata has no NULL texts, so a Spark/oracle
pair can silently disagree on NULLs and still pass every driver round —
the round-5 advisor found exactly that in gopher_rules / boilerplate_removal
/ dedup_exact. This test builds a fixture with NULL / empty / whitespace-only
probe docs (tools/make_nulltext_fixture.py) and runs the driver-faithful
compare (tools/check.py) on every text-consuming query pair, so any
one-sided NULL handling goes red here instead of latently.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check import TABLES, _pandas_rows, table_hash          # noqa: E402
from make_nulltext_fixture import build                     # noqa: E402

# every queries() entry that reads documents.text; listed explicitly so a
# new text query must either join this gate or consciously opt out
TEXT_QUERIES = [
    "dedup_exact", "multimodal_decode", "frame_sampling", "audio_segments",
    "text_fingerprint", "regex_functions", "gopher_rules",
    "boilerplate_removal", "linear_quality", "text_tokens", "text_quality",
    "text_language_id", "text_repetition", "lm_doc_score",
    "bm25_term_topk", "leakage_safe_split",
    "heavy_hitters", "cms_frequency", "inverted_index", "bpe_merges",
    "block_dedup", "vocab_concentration", "cosine_pair_topk",
    # r13: the real-decoder roundtrips — NULL text must synthesize the
    # empty-string digest stream identically on both engines
    "media_phash", "media_audiofp", "media_neardup", "media_dedup_clusters",
    "media_videofp", "video_neardup", "video_scene_cuts",
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return build("/root/testdata/sf0.001",
                 str(tmp_path_factory.mktemp("nulltext")))


@pytest.fixture(scope="module")
def duck(fixture_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fixture_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_nulltext_parity(spark, fixture_dir, duck, name):
    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    assert name in queries, f"{name} vanished from the registry"
    sdf = queries[name](spark, fixture_dir)
    sdtypes = {f.name: f.dataType.simpleString().upper()
               for f in sdf.schema.fields}
    srows = _pandas_rows(sdf.toPandas(), sdf.columns, sdtypes)
    desc = duck.execute("DESCRIBE " + oracles[name]).fetchall()
    dtypes = {d[0]: str(d[1]).upper() for d in desc}
    res = duck.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = _pandas_rows(res.df(), ocols, dtypes)
    assert len(srows) == len(orows), (len(srows), len(orows))
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(list(sdf.columns), srows) == table_hash(ocols, orows)
