"""scripts/gen_sf1.py integrity (VERDICT r6 task 5 support): the x10
replication must preserve referential integrity, text lengths (n_chars
stays true under word rotation), and embedding dims — checked at sf0.001
source scale so the test stays cheap."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

ROOT = Path(__file__).resolve().parent.parent
SRC = Path("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_scaled")
    subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "gen_sf1.py"),
         str(SRC), str(dst)],
        check=True,
        capture_output=True,
    )
    return dst


def test_row_counts_scale_10x(gen_dir):
    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        src_n = con.sql(f"select count(*) from '{SRC}/{t}.parquet'").fetchone()[0]
        dst_n = con.sql(f"select count(*) from '{gen_dir}/{t}.parquet'").fetchone()[0]
        assert dst_n == 10 * src_n, t
    for t in ("region", "nation"):  # fixed dimensions stay verbatim
        src_n = con.sql(f"select count(*) from '{SRC}/{t}.parquet'").fetchone()[0]
        dst_n = con.sql(f"select count(*) from '{gen_dir}/{t}.parquet'").fetchone()[0]
        assert dst_n == src_n, t


def test_referential_integrity_and_key_uniqueness(gen_dir):
    con = duckdb.connect()
    d = str(gen_dir)
    # unique keys after remapping
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id")):
        dup = con.sql(
            f"select count(*) - count(distinct {k}) from '{d}/{t}.parquet'"
        ).fetchone()[0]
        assert dup == 0, t
    # every FK resolves
    for fk_sql in (
        f"select count(*) from '{d}/lineitem.parquet' l left join "
        f"'{d}/orders.parquet' o on l.l_orderkey = o.o_orderkey "
        "where o.o_orderkey is null",
        f"select count(*) from '{d}/lineitem.parquet' l left join "
        f"'{d}/part.parquet' p on l.l_partkey = p.p_partkey "
        "where p.p_partkey is null",
        f"select count(*) from '{d}/orders.parquet' o left join "
        f"'{d}/customer.parquet' c on o.o_custkey = c.c_custkey "
        "where c.c_custkey is null",
    ):
        assert con.sql(fk_sql).fetchone()[0] == 0


def test_documents_rotation_preserves_length_and_replica0(gen_dir):
    con = duckdb.connect()
    d = str(gen_dir)
    # n_chars stays true for every replica (rotation preserves length)
    assert con.sql(
        f"select count(*) from '{d}/documents.parquet' "
        "where n_chars <> length(text)"
    ).fetchone()[0] == 0
    # replica 0 is the source verbatim
    assert con.sql(
        f"select count(*) from '{d}/documents.parquet' g join "
        f"'{SRC}/documents.parquet' s using (doc_id) where g.text <> s.text"
    ).fetchone()[0] == 0


def test_embeddings_keep_dim_and_perturb_off_replica0(gen_dir):
    con = duckdb.connect()
    d = str(gen_dir)
    dims = con.sql(
        f"select distinct len(embedding) from '{d}/embeddings.parquet'"
    ).fetchall()
    assert dims == [(64,)]
    # replica 0 identical; later replicas actually differ (no exact-tie
    # top-k degeneracy)
    n_src = con.sql(
        f"select count(*) from '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    same = con.sql(
        f"select count(*) from '{d}/embeddings.parquet' g join "
        f"'{SRC}/embeddings.parquet' s on g.vec_id = s.vec_id "
        "where g.embedding = s.embedding"
    ).fetchone()[0]
    assert same == n_src
    # replica 1 lives at the script's fixed vec_id stride (2000 — sf0.1's
    # key range; smaller sources still fit under it)
    diff = con.sql(
        f"select count(*) from '{d}/embeddings.parquet' g join "
        f"'{SRC}/embeddings.parquet' s on g.vec_id = s.vec_id + 2000 "
        "where g.embedding <> s.embedding"
    ).fetchone()[0]
    assert diff == n_src
