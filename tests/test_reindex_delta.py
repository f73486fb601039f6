"""Snapshot-diff reindexing (streaming/incremental.reindex_delta).

The reference rebuilds its whole in-RAM index per session (app.py);
reindex_delta replaces that with id-set algebra over the committed
index: deletions tombstoned, new versions appended, unchanged docs
untouched — then merge_segments restores bit-exact fresh-build parity.
"""

from __future__ import annotations

import pandas as pd
import pytest

from data_text_search_spark.config import BM25Config
from data_text_search_spark.fixtures.corpus import corpus_pandas
from data_text_search_spark.operators.index_build import build_index, load_manifest
from data_text_search_spark.operators.index_query import IndexSearcher
from data_text_search_spark.streaming.incremental import (
    delete_documents,
    merge_segments,
    reindex_delta,
)

QUERY = "return import def class"


def _versions(n=200, n_changed=20, n_removed=10, n_new=10):
    """v1 = old corpus state, v2 = target snapshot.

    vs v2: v1 carries `n_changed` docs as stale versions under shifted
    ids (a changed file = old id vanishes, new id appears), `n_removed`
    docs v2 no longer has, and lacks v2's last `n_new` docs.
    """
    pdf = corpus_pandas(n).reset_index().rename(columns={"index": "doc_id"})
    stale = pdf.iloc[:n_changed].copy()
    stale["doc_id"] += 1_000_000
    stale["content"] = "stale draft revision " + stale["content"]
    removed = pdf.iloc[n_changed:n_changed + n_removed].copy()
    removed["doc_id"] += 2_000_000
    v1 = pd.concat([stale, removed, pdf.iloc[n_changed:n - n_new]])
    v2 = pdf
    return v1, v2


def _topk(spark, root, q=QUERY, k=10):
    s = IndexSearcher(spark, root)
    return [(r["doc_id"], round(r["score"], 9))
            for r in s.search(q, k).collect()]


def test_reindex_converges_and_matches_fresh_build(spark, tmp_path):
    v1, v2 = _versions()
    root = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(v1), root, BM25Config(),
                id_col="doc_id", shards=4, groups=1)
    res = reindex_delta(spark, root, spark.createDataFrame(v2),
                        id_col="doc_id")
    assert res["n_added"] == 20 + 10      # changed (new ids) + brand-new
    assert res["n_deleted"] == 20 + 10    # stale versions + removed
    assert res["n_unchanged"] == 170
    # stale versions gone from results immediately (tombstone masking);
    # "stale draft" tokens exist ONLY in the replaced old versions
    assert _topk(spark, root, "stale draft") == []
    # purge + stat refresh -> bit-identical to a fresh build over v2
    merge_segments(spark, root)
    fresh = str(tmp_path / "fresh")
    build_index(spark, spark.createDataFrame(v2), fresh, BM25Config(),
                id_col="doc_id", shards=4, groups=1)
    for q in (QUERY, "zyzzyva", "merge_row spill_page"):
        assert _topk(spark, root, q) == _topk(spark, fresh, q)
    assert load_manifest(root)["n_docs"] == len(v2)


def test_reindex_idempotent_and_resumable(spark, tmp_path):
    v1, v2 = _versions(n=120, n_changed=10, n_removed=5, n_new=5)
    root = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(v1), root, BM25Config(),
                id_col="doc_id", shards=4, groups=1)
    # crash-resume: the delete leg committed, the append leg did not —
    # re-running the SAME snapshot converges instead of double-applying
    gone = spark.createDataFrame(v1[~v1.doc_id.isin(v2.doc_id)])
    delete_documents(spark, root, gone.select("doc_id"))
    res = reindex_delta(spark, root, spark.createDataFrame(v2),
                        id_col="doc_id")
    assert res["n_deleted"] == 0 and res["n_added"] == 15
    # idempotent: same snapshot again is a no-op diff
    res2 = reindex_delta(spark, root, spark.createDataFrame(v2),
                         id_col="doc_id")
    assert res2["n_added"] == 0 and res2["n_deleted"] == 0
    assert res2["n_unchanged"] == len(v2)
    assert res2["manifest"]["n_docs"] == load_manifest(root)["n_docs"]


def test_reindex_rejects_unpurged_resurrection(spark, tmp_path):
    v1, v2 = _versions(n=100, n_changed=5, n_removed=5, n_new=0)
    root = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(v1), root, BM25Config(),
                id_col="doc_id", shards=4, groups=1)
    # delete a doc that the snapshot still wants -> must refuse until purge
    keep_id = int(v2.doc_id.iloc[-1])
    delete_documents(spark, root, [keep_id])
    with pytest.raises(ValueError, match="merge_segments"):
        reindex_delta(spark, root, spark.createDataFrame(v2),
                      id_col="doc_id")
    # after the purge the same snapshot applies cleanly
    merge_segments(spark, root)
    res = reindex_delta(spark, root, spark.createDataFrame(v2),
                        id_col="doc_id")
    assert res["n_added"] == 5 + 1        # changed versions + resurrected
    assert res["n_deleted"] == 10         # stale + removed versions
    # physical n_docs = snapshot + the 10 tombstoned-but-unpurged
    assert res["manifest"]["n_docs"] == len(v2) + 10


def test_reindex_repo_path_commit_identity(spark, tmp_path):
    # derived identity: doc_id = xxhash64(repo, path, commit), shared
    # with ingest via assign_doc_id — a new commit of one file is one
    # delete + one add, no id_col anywhere
    pdf = corpus_pandas(80)
    root = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), root, BM25Config(),
                shards=4, groups=1)
    v2 = pdf.copy()
    v2.loc[v2.index[0], "commit"] = "deadbeef" * 5
    v2.loc[v2.index[0], "content"] = "xenolith granite survey " * 4
    v2 = v2.iloc[:-1]                      # one file removed
    res = reindex_delta(spark, root, spark.createDataFrame(v2))
    assert res["n_added"] == 1 and res["n_deleted"] == 2
    assert res["n_unchanged"] == len(v2) - 1
    hits = _topk(spark, root, "xenolith granite", k=3)
    assert len(hits) == 1
