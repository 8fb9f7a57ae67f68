"""Round-6 adversarial degenerate-input sweep (VERDICT r5 task 6): the
round-5 operators under the shapes that broke q_lang_id in round 1 —
single-event users (no trigram path, no inter-event gap can exist),
all-hit and zero-hit corpora for the toxicity lexicon (plus the empty-
blocklist config), an all-one-language corpus for the confusion matrix,
and query vectors with ZERO eligible candidates for filtered kNN /
semi-hard negative mining. Oracle-gated queries must keep exact parity
(usually: both engines emit zero or collapsed rows without crashing)."""

from __future__ import annotations

import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR
from tests.helpers import signature


def _make_dir(tmp_path_factory, name: str, overrides: dict[str, str]) -> str:
    """Copy the sf0.001 tables, replacing those in ``overrides`` (table ->
    SELECT sql) with synthetic degenerate versions."""
    dst = tmp_path_factory.mktemp(name)
    con = duckdb.connect()
    for t in TABLES:
        if t in overrides:
            con.execute(
                f"COPY ({overrides[t]}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


def _parity(spark, sf_dir: str, name: str) -> tuple:
    rq = all_queries()[name]
    assert rq.oracle is not None
    sdf = rq.builder(spark, sf_dir)
    got = signature(sdf.columns, [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.execute(rq.oracle)
    want = signature(
        [d[0] for d in res.description], [tuple(r) for r in res.fetchall()]
    )
    con.close()
    assert got == want, f"{name} diverges on degenerate corpus"
    return got


# -- single-event users: no path, no gap --------------------------------------

SINGLE_EVENT_USERS = """
  SELECT CAST(i AS BIGINT) AS event_id,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) MINUTE AS ts,
         CAST(i AS BIGINT) AS user_id,
         ['click','view','purchase'][1 + i % 3] AS event_type,
         CAST(i AS DOUBLE) AS value,
         '{}' AS props
    FROM generate_series(1, 40) s(i)
"""


def test_single_event_users_paths_and_gaps(spark, tmp_path_factory):
    d = _make_dir(
        tmp_path_factory, "single_ev", {"events": SINGLE_EVENT_USERS}
    )
    # every user has exactly one event: no 3-gram path, no lag gap — both
    # engines must emit ZERO rows (this is the sequence(1,0)=[1,0] trap)
    got_paths = _parity(spark, d, "q_event_paths")
    got_gaps = _parity(spark, d, "q_inter_event_gaps")
    assert got_paths[0] == 0 and got_gaps[0] == 0


def test_two_event_users_still_no_trigram(spark, tmp_path_factory):
    """PATH_N-1 events per user: one gap exists, still zero trigrams."""
    two = """
      SELECT CAST(i AS BIGINT) AS event_id,
             TIMESTAMP '2024-01-01' + INTERVAL (i) MINUTE AS ts,
             CAST(i % 10 AS BIGINT) AS user_id,
             'click' AS event_type, 1.0 AS value, '{}' AS props
        FROM generate_series(1, 20) s(i)
    """
    d = _make_dir(tmp_path_factory, "two_ev", {"events": two})
    assert _parity(spark, d, "q_event_paths")[0] == 0
    gaps = _parity(spark, d, "q_inter_event_gaps")
    assert gaps[0] == 1  # one event_type row with 10 gaps


# -- toxicity lexicon: all-hit, zero-hit, empty blocklist ----------------------


def test_toxicity_all_hit_and_zero_hit(spark, tmp_path_factory):
    from prefect_flow_arc_indexer_spark.operators.corpus_policy import (
        BLOCKLIST,
    )

    t0, t1 = BLOCKLIST[0], BLOCKLIST[-1]
    docs = f"""
      SELECT CAST(1 AS BIGINT) AS doc_id, '{t0} {t1} {t0}' AS text,
             'en' AS lang, 'hot' AS source, CAST(10 AS BIGINT) AS n_chars
      UNION ALL SELECT 2, '{t1}', 'en', 'hot', 5
      UNION ALL SELECT 3, 'perfectly clean words here', 'en', 'clean', 26
      UNION ALL SELECT 4, NULL, 'en', 'clean', 0
    """
    d = _make_dir(tmp_path_factory, "tox", {"documents": docs})
    _parity(spark, d, "q_toxicity_lexicon")
    rows = {
        r.source: r
        for r in all_queries()["q_toxicity_lexicon"].builder(spark, d).collect()
    }
    # every non-NULL doc in 'hot' hits -> flag rate exactly 1e6 micro
    assert rows["hot"].n_flagged == 2 and rows["hot"].flag_rate_micro == 1_000_000
    assert rows["hot"].total_hits == 4
    # the clean source flags nothing but still reports its census
    assert rows["clean"].n_docs == 1 and rows["clean"].flag_rate_micro == 0


def test_toxicity_empty_blocklist_config(spark, monkeypatch):
    """An EMPTY lexicon (misconfigured deploy) must yield zero hits
    everywhere, not crash on the empty array literal."""
    import prefect_flow_arc_indexer_spark.operators.corpus_policy as cp

    monkeypatch.setattr(cp, "BLOCKLIST", [])
    out = cp.q_toxicity_lexicon(spark, SF_DIR).collect()
    assert out  # sources still reported
    assert all(r.total_hits == 0 and r.flag_rate_micro == 0 for r in out)


# -- all-one-language corpus ---------------------------------------------------


def test_lang_confusion_single_language_corpus(spark, tmp_path_factory):
    docs = """
      SELECT CAST(i AS BIGINT) AS doc_id,
             'the quick brown fox and the lazy dog with some more of the '
               || 'usual english filler text' AS text,
             'en' AS lang, 'synthetic' AS source, CAST(86 AS BIGINT) AS n_chars
        FROM generate_series(1, 12) s(i)
    """
    d = _make_dir(tmp_path_factory, "one_lang", {"documents": docs})
    got = _parity(spark, d, "q_lang_confusion")
    rows = all_queries()["q_lang_confusion"].builder(spark, d).collect()
    # one declared language only; cells partition the full corpus
    assert {r.declared_lang for r in rows} == {"en"}
    assert sum(r.n_docs for r in rows) == 12
    assert got[0] == len(rows)


# -- zero eligible candidates --------------------------------------------------


def _emb_sql(label_expr: str) -> str:
    """16-dim embeddings with a controllable label expression."""
    return f"""
      SELECT CAST(i AS BIGINT) AS vec_id,
             list_transform(generate_series(1, 16),
                 j -> CAST(sin(i * 7 + j) AS FLOAT)) AS embedding,
             CAST({label_expr} AS INTEGER) AS label
        FROM generate_series(0, 19) s(i)
    """


def test_filtered_knn_zero_candidates(spark, tmp_path_factory):
    """No corpus row passes the metadata filter (label % 3 == 0): the join
    yields nothing and BOTH engines emit zero rows — the empty-ACL shape."""
    d = _make_dir(
        tmp_path_factory, "no_cand", {"embeddings": _emb_sql("1 + (i % 2)")}
    )
    assert _parity(spark, d, "q_filtered_knn")[0] == 0


def test_semihard_negatives_single_label_corpus(spark, tmp_path_factory):
    """Every vector shares one label: no different-label negative exists for
    any query — zero rows, no crash, exact parity."""
    d = _make_dir(
        tmp_path_factory, "one_label", {"embeddings": _emb_sql("3")}
    )
    assert _parity(spark, d, "q_semihard_negatives")[0] == 0
    # sanity: the sibling filtered query DOES return rows here (label%3==0)
    assert _parity(spark, d, "q_filtered_knn")[0] > 0


# -- round-6 additions under the same degenerate shapes ------------------------


def test_skyline_and_top_p_empty_vocab(spark, tmp_path_factory):
    """All-NULL/empty/whitespace corpus: zero tokenizable docs -> skyline
    and top-p emit zero rows on both engines; the epoch plan emits zero
    sources (no token mass to plan)."""
    docs = """
      SELECT CAST(1 AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS text,
             'en' AS lang, 's1' AS source, CAST(0 AS BIGINT) AS n_chars
      UNION ALL SELECT 2, '', 'en', 's1', 0
      UNION ALL SELECT 3, '   ', 'en', 's2', 3
    """
    d = _make_dir(tmp_path_factory, "r6_empty", {"documents": docs})
    assert _parity(spark, d, "q_skyline_docs")[0] == 0
    # whitespace-only docs still register with n_tok... no: tokens() drops
    # empties, so n_tok=0 rows carry zero mass — cum==total==0 means the
    # strict inclusion test (5*(cum-n) < 4*total -> 0 < 0) excludes them
    assert _parity(spark, d, "q_top_p_corpus")[0] == 0
    assert _parity(spark, d, "q_epoch_plan")[0] >= 0  # parity is the gate


def test_skyline_single_doc_and_identical_docs(spark, tmp_path_factory):
    """One doc is trivially the whole skyline; N identical docs are ALL
    skyline members (none strictly dominates another)."""
    one = """
      SELECT CAST(1 AS BIGINT) AS doc_id, 'alpha beta gamma' AS text,
             'en' AS lang, 's' AS source, CAST(16 AS BIGINT) AS n_chars
    """
    d1 = _make_dir(tmp_path_factory, "r6_one", {"documents": one})
    assert _parity(spark, d1, "q_skyline_docs")[0] == 1

    same = """
      SELECT CAST(i AS BIGINT) AS doc_id, 'alpha beta alpha' AS text,
             'en' AS lang, 's' AS source, CAST(16 AS BIGINT) AS n_chars
        FROM generate_series(1, 7) s(i)
    """
    d2 = _make_dir(tmp_path_factory, "r6_same", {"documents": same})
    assert _parity(spark, d2, "q_skyline_docs")[0] == 7


def test_top_p_single_doc_per_source_keeps_it(spark, tmp_path_factory):
    """A source with one doc: that doc IS the nucleus (cum-n=0 < 4/5 total),
    so nothing is trimmed — the budget never empties a source."""
    docs = """
      SELECT CAST(1 AS BIGINT) AS doc_id, 'one tiny doc' AS text,
             'en' AS lang, 'solo' AS source, CAST(12 AS BIGINT) AS n_chars
      UNION ALL SELECT 2, 'another doc with rather more words inside it',
                'en', 'duo', 45
      UNION ALL SELECT 3, 'short', 'en', 'duo', 5
    """
    d = _make_dir(tmp_path_factory, "r6_solo", {"documents": docs})
    got = _parity(spark, d, "q_top_p_corpus")
    rows = all_queries()["q_top_p_corpus"].builder(spark, d).collect()
    assert ("solo" in {r.source for r in rows}) and got[0] == len(rows)
