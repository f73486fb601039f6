"""Training-data pipeline operators: approximate paths verified against
their exact counterparts, plus joins / semantic / fuzzy semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_text_search_spark.operators import (
    dedup,
    fuzzy,
    joins,
    semantic,
    similarity,
    textstats,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ----------------------------------------------------------------- dedup

def test_minhash_lsh_subset_of_exact_with_high_recall(documents):
    exact = {(r["doc_a"], r["doc_b"])
             for r in dedup.ngram_jaccard_pairs(documents, threshold=0.5).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in dedup.minhash_lsh_pairs(documents, threshold=0.5).collect()}
    assert lsh <= exact          # exact-verify step → perfect precision
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.9, f"LSH recall {recall} over {len(exact)} pairs"


def test_minhash_jaccard_values_match_exact(documents):
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(documents, threshold=0.5).collect()}
    for r in dedup.minhash_lsh_pairs(documents, threshold=0.5).collect():
        assert exact[(r["doc_a"], r["doc_b"])] == r["jaccard"]


def test_simhash_identical_docs_collide(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                 "totally different words here"]})
    df = spark.createDataFrame(pdf)
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}
    assert pairs[0]["hamming"] == 0


def test_exact_dedup_groups(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["Same   Text", "same text", "other", "  SAME TEXT "]})
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: (r["canonical_doc_id"], r["group_size"])
            for r in dedup.exact_dup_groups(df).collect()}
    # whitespace-normalized lowercase: docs 0,1,3 identical
    assert rows[0] == (0, 3) and rows[1] == (0, 3) and rows[3] == (0, 3)
    assert rows[2] == (2, 1)


# ------------------------------------------------------------- similarity

def test_ann_lsh_vs_brute_force(embeddings):
    qv = [float(v) for v in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    brute = [r["vec_id"] for r in
             similarity.cosine_topk(embeddings, qv, k=10).collect()]
    ann = [r["vec_id"] for r in
           similarity.lsh_ann_topk(embeddings, qv, k=10, probe_hamming=16).collect()]
    # probe_hamming=16 degenerates to exhaustive → must equal brute force
    assert ann == brute
    # narrow probe: results are a subset of the scored universe and any
    # returned score matches the brute-force score for that id
    brute_scores = {r["vec_id"]: r["score"] for r in
                    similarity.cosine_topk(embeddings, qv, k=500).collect()}
    for r in similarity.lsh_ann_topk(embeddings, qv, k=10, probe_hamming=2).collect():
        assert brute_scores[r["vec_id"]] == r["score"]


def test_cosine_self_similarity_first(embeddings):
    qv = [float(v) for v in embeddings.filter("vec_id = 7").first()["embedding"]]
    top = similarity.cosine_topk(embeddings, qv, k=1).first()
    assert top["vec_id"] == 7 and abs(top["score"] - 1.0) < 1e-6


# --------------------------------------------------------------- semantic

def test_stub_embedder_deterministic_and_normalized():
    e = semantic.StubEmbedder(dim=32)
    a = e.encode(["hello world", "hello world", "other"])
    assert np.allclose(a[0], a[1])
    assert not np.allclose(a[0], a[2])
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_embed_column_matches_driver_side(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["abc", "xyz"]})
    got = semantic.embed_column(spark.createDataFrame(pdf), "text",
                                dim=16).orderBy("doc_id").collect()
    want = semantic.StubEmbedder(dim=16).encode(["abc", "xyz"])
    for r, w in zip(got, want):
        assert np.allclose(np.array(r["embedding"]), w, atol=1e-6)


def test_semantic_search_filters(spark):
    pdf = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "text": ["x" * 200, "y" * 200, "short"],
    })
    df = semantic.embed_column(spark.createDataFrame(pdf), "text", dim=16)
    qv = [float(v) for v in df.filter("vec_id = 0").first()["embedding"]]
    rows = semantic.semantic_search(df, qv, k=10, cutoff=0.2,
                                    text_col="text").collect()
    ids = [r["vec_id"] for r in rows]
    assert 0 in ids           # self-match, score 1.0
    assert 2 not in ids       # min-length filter (P5): len < 100 dropped


# ------------------------------------------------------------------ fuzzy

def test_fuzzy_search_semantics(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["table scan table", "tible scanning", "nothing relevant"]})
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r for r in
            fuzzy.fuzzy_search(spark, df, "table", 1).collect()}
    assert rows[0]["match_count"] == 2      # 'table' twice, distance 0
    assert rows[1]["match_count"] == 1      # 'tible' distance 1
    assert 2 not in rows                    # no match within 1 edit
    r0 = rows[0]
    assert r0["score"] == pytest.approx(2 / r0["n_chars"] * 100)
    assert r0["score_abs"] == abs(round(r0["score"], 2))


def test_fuzzy_empty_query(spark, documents):
    assert fuzzy.fuzzy_search(spark, documents, "???", 1).count() >= 0


# ------------------------------------------------------------------ joins

def test_join_user_table_key_norm_and_dedup(spark):
    results = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "score": [3.0, 2.0, 1.0],
                      "key": ["42", "7", "9"]}))
    join_df = spark.createDataFrame(
        pd.DataFrame({"k": ["42.0", "42.0", "7", "8"],
                      "attr": ["a", "a", "b", "c"],
                      "score": [9.9, 9.9, 8.8, 7.7]}))
    out = joins.join_user_table(results, join_df, "key", "k").orderBy("doc_id")
    rows = out.collect()
    # '42.0' normalized → matches '42'; dup key deduped; name collision → _y
    assert rows[0]["attr"] == "a" and rows[0]["score_y"] == 9.9
    assert rows[1]["attr"] == "b"
    assert rows[2]["attr"] is None          # left join keeps unmatched
    assert rows[0]["score"] == 3.0          # left columns untouched


def test_join_results_to_corpus_broadcast(spark, documents):
    topk = documents.select("doc_id").limit(5).withColumn("score", F.lit(1.0))
    joined = joins.join_results_to_corpus(topk, documents)
    assert joined.count() == 5
    assert "text" in joined.columns
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# -------------------------------------------------------------- textstats

def test_lang_id_english_stopwords(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["the cat and the dog of the house is on with as",
                 "el gato y la casa de que en un por"]})
    rows = {r["doc_id"]: r["lang_pred"] for r in
            textstats.lang_id(spark.createDataFrame(pdf)).collect()}
    assert rows[0] == "en" and rows[1] == "es"


def test_quality_ranges(documents):
    rows = textstats.quality(documents).collect()
    for r in rows:
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stop_ratio"] <= 1.0
        assert r["mean_token_len"] >= 0.0


# -------------------------------------------------------------- multimodal

def test_multimodal_plumbing(spark):
    from data_text_search_spark.operators import multimodal as mm
    media = mm.synth_media(spark, 30)
    assert media.count() == 30
    feats = mm.decode_and_featurize(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism across partitionings
    again = mm.decode_and_featurize(media.repartition(7), fake=True).collect()
    a = {r["media_id"]: r["feature"] for r in feats}
    b = {r["media_id"]: r["feature"] for r in again}
    assert a == b


def test_multimodal_real_decode_is_stubbed(spark):
    from data_text_search_spark.operators import multimodal as mm
    media = mm.synth_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        mm.decode_and_featurize(media, fake=False).collect()


def test_frame_sampling(spark):
    from data_text_search_spark.operators import multimodal as mm
    media = mm.synth_media(spark, 12)
    frames = mm.frame_sample(media, every_ms=500, fake=True).collect()
    assert frames, "video rows must yield frames"
    vids = {r["media_id"] for r in frames}
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert all(kinds[v] == "video" for v in vids)
    for r in frames[:3]:
        assert len(r["frame_feature"]) == 64
        assert r["ts_ms"] % 500 == 0


def test_int8_quantization_roundtrip(spark, embeddings):
    import numpy as np
    q = semantic.quantize_int8(embeddings.limit(20))
    d = (semantic.dequantize_int8(q.drop("embedding"))
         .withColumnRenamed("embedding", "deq"))
    rows = d.join(embeddings.select("vec_id", "embedding"), "vec_id").collect()
    assert rows
    for r in rows:
        a = np.array(r["embedding"], dtype=np.float32)
        b = np.array(r["deq"], dtype=np.float32)
        assert np.max(np.abs(a - b)) <= 1.0 / 127 + 1e-6


def test_fuzzy_phrase_search(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox", "the quick crown fox jumps",
                 "nothing here"]})
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r for r in
            fuzzy.fuzzy_phrase_search(spark, df, "quick brown fox", 1).collect()}
    assert rows[0]["match_count"] == 1       # exact phrase
    assert rows[1]["match_count"] == 1       # 'crown' = 1 edit from 'brown'
    assert 2 not in rows
    # phrase longer than doc and empty query are safe
    assert fuzzy.fuzzy_phrase_search(
        spark, df, "a b c d e f g h i j k l m n o p", 1).count() == 0
    assert fuzzy.fuzzy_phrase_search(spark, df, "", 1).count() == 0


def test_cosine_dup_pairs_exact_vs_lsh(embeddings):
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             similarity.cosine_dup_pairs(embeddings, threshold=0.6).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           similarity.lsh_dup_pairs(embeddings, threshold=0.6).collect()}
    assert set(lsh) <= set(exact)       # exact-verify → perfect precision
    for k, v in lsh.items():
        assert exact[k] == v
