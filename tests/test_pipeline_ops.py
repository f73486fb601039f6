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


def test_minhash_mersenne_fold_equals_modulo():
    """The round-6 shift-add fold in minhash_sig must be bit-identical
    to the `% (2^61-1)` it replaced, over the full uint64 range of the
    wrapped permutation value (including values >= M and exact
    multiples of M)."""
    M_ = (1 << 61) - 1
    M = np.uint64(M_)
    rs = np.random.RandomState(7)
    x = rs.randint(-2**63, 2**63 - 1, size=200_000,
                   dtype=np.int64).view(np.uint64)
    edge = np.array([0, 1, M_ - 1, M_, M_ + 1, 2 * M_, 2 * M_ + 5,
                     2**64 - 1, 2**63, 7 * M_], dtype=np.uint64)
    x = np.concatenate([x, edge])
    want = x % M
    y = (x >> np.uint64(61)) + (x & M)
    y = np.where(y >= M, y - M, y)
    assert np.array_equal(want, y)


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


def test_simhash_banding_recall_exact(spark, documents):
    """Pigeonhole recall is EXACT: every pair within max_hamming=3 of the
    computed fingerprints must be emitted (checked brute-force over a
    1000-doc sample), and nothing below the bar."""
    sample = documents.limit(1000)
    vals = {r["doc_id"]: r["sh"] for r in sample.select(
        "doc_id", dedup.simhash_expr("text").alias("sh")).collect()}
    ids = sorted(vals)
    arr = np.array([vals[i] for i in ids], dtype=np.int64).view(np.uint64)
    xor = arr[:, None] ^ arr[None, :]
    ham = np.zeros(xor.shape, dtype=np.int32)
    for _ in range(64):
        ham += (xor & np.uint64(1)).astype(np.int32)
        xor >>= np.uint64(1)
    ai, bi = np.nonzero((ham <= 3) & (np.arange(len(ids))[:, None]
                                      < np.arange(len(ids))[None, :]))
    want = {(ids[x], ids[y]) for x, y in zip(ai, bi)}
    got = {(r["doc_a"], r["doc_b"])
           for r in dedup.simhash_pairs(sample, max_hamming=3).collect()}
    assert got == want


def test_simhash_small_edit_small_hamming(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight ") * 3
    edited = base.replace("forest", "woods")
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0, 1], "text": [base, edited]}))
    rows = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", dedup.simhash_expr("text").alias("sh")).collect()}
    ham = bin((rows[0] ^ rows[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 12, ham        # one token of ~60 flips few vote margins


def test_hot_shingle_cap_bounds_candidates(spark):
    """Pathological corpus: one boilerplate line shared by ALL docs. The
    capped candidate join must skip the hot shingles (bounded work) while
    keeping pairs that share any rare shingle, with EXACT jaccard."""
    boiler = ("this standard header line appears in every single document "
              "of the whole corpus")
    texts = [f"{boiler} unique tail {i} content {i * 7}" for i in range(100)]
    texts.append("rare alpha beta gamma delta epsilon zeta eta theta")
    texts.append("rare alpha beta gamma delta epsilon zeta eta iota")
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in dedup.ngram_jaccard_pairs(
                  df, threshold=0.3, max_shingle_df=10).collect()}
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(df, threshold=0.3).collect()}
    # the rare-shingle near-dup pair survives the cap with its exact value
    assert (100, 101) in capped
    assert capped[(100, 101)] == exact[(100, 101)]
    # capped ⊆ exact; boilerplate-only pairs (candidates via hot shingles
    # alone) are the ones dropped
    assert set(capped) <= set(exact)
    assert len(capped) < len(exact)
    for k, v in capped.items():
        assert exact[k] == v


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
           similarity.lsh_ann_topk(embeddings, qv, k=10, probe_hamming=64).collect()]
    # probe_hamming=64 degenerates to exhaustive → must equal brute force
    assert ann == brute
    # narrow probe: results are a subset of the scored universe and any
    # returned score matches the brute-force score for that id
    brute_scores = {r["vec_id"]: r["score"] for r in
                    similarity.cosine_topk(embeddings, qv, k=500).collect()}
    for r in similarity.lsh_ann_topk(embeddings, qv, k=10, probe_hamming=8).collect():
        assert brute_scores[r["vec_id"]] == r["score"]


def test_ann_index_search_vs_brute_force(spark, embeddings, tmp_path):
    root = str(tmp_path / "ann")
    similarity.build_ann_index(embeddings, root)
    qv = [float(v) for v in
          embeddings.filter("vec_id = 3").first()["embedding"]]
    brute = [r["vec_id"] for r in
             similarity.cosine_topk(embeddings, qv, k=10).collect()]
    # full probe (all buckets, hamming 64) degenerates to exhaustive
    full = [r["vec_id"] for r in similarity.ann_index_search(
        spark, root, qv, k=10, probe_hamming=64,
        n_flip_bits=similarity.BUCKET_BITS).collect()]
    assert full == brute
    # default probes: the self-match must be found, and every returned
    # score is the exact brute-force score for that id (exact rescoring)
    got = similarity.ann_index_search(spark, root, qv, k=10).collect()
    assert got and got[0]["vec_id"] == 3 and abs(got[0]["score"] - 1.0) < 1e-6
    brute_scores = {r["vec_id"]: r["score"] for r in
                    similarity.cosine_topk(embeddings, qv, k=500).collect()}
    for r in got:
        assert brute_scores[r["vec_id"]] == r["score"]


def test_ann_index_recall_on_planted_near_dups(spark, tmp_path):
    """Recall contract where ANN recall is actually defined: high-cosine
    neighbors. 40 random base vectors, each with 3 planted near-dup
    copies (pairwise cosine ≈ 0.97); querying a perturbed base vector at default
    probes must recover ≥90% of its planted family. (The driver
    embeddings' 'top-10' sit at cosine ≈0.3 — near-orthogonal points no
    LSH family can bucket; that regime is covered by the exact path.)"""
    rs = np.random.RandomState(5)
    rows, fam = [], {}
    vid = 0
    for b in range(40):
        base = rs.standard_normal(similarity.EMB_DIM)
        base /= np.linalg.norm(base)
        fam[b] = []
        for c in range(4):
            v = base + rs.standard_normal(similarity.EMB_DIM) * 0.02
            rows.append((vid, [float(x) for x in v]))
            fam[b].append(vid)
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    root = str(tmp_path / "annplant")
    similarity.build_ann_index(df, root)
    found = total = 0
    for b in (0, 7, 23):
        qv = rows[fam[b][0]][1]
        got = {r["vec_id"] for r in
               similarity.ann_index_search(spark, root, qv, k=4).collect()}
        found += len(got & set(fam[b]))
        total += 4
    assert found / total >= 0.9, (found, total)


def test_ann_topk_fills_k_without_near_neighbors(spark, embeddings, tmp_path):
    """Shortlist backfill: on a corpus with NO true near neighbors
    (driver embeddings, max pairwise cosine ~0.51, expected hamming ≈32),
    the hamming cutoff alone strands a top-k query at ~1 row. The
    lowest-hamming shortlist must fill k, scores must stay exact, and
    rows must come back cosine-descending."""
    qv = [float(v) for v in
          embeddings.filter("vec_id = 11").first()["embedding"]]
    brute_scores = {r["vec_id"]: r["score"] for r in
                    similarity.cosine_topk(embeddings, qv, k=1000).collect()}
    got = similarity.lsh_ann_topk(embeddings, qv, k=20).collect()
    assert len(got) == 20
    assert [r["score"] for r in got] == sorted(
        (r["score"] for r in got), reverse=True)
    for r in got:
        assert brute_scores[r["vec_id"]] == r["score"]
    # persisted-index path: k filled from probed buckets only
    root = str(tmp_path / "annfill")
    similarity.build_ann_index(embeddings, root)
    got_idx = similarity.ann_index_search(spark, root, qv, k=20).collect()
    assert len(got_idx) == 20
    for r in got_idx:
        assert brute_scores[r["vec_id"]] == r["score"]


def test_ann_index_scan_is_bucket_pruned(spark, embeddings, tmp_path):
    """The probed scan must read only probed bucket partitions
    (PartitionFilters on `bucket`), not the whole index."""
    root = str(tmp_path / "annplan")
    similarity.build_ann_index(embeddings, root)
    qv = [float(v) for v in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    plan = similarity.ann_index_search(
        spark, root, qv, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan


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


def test_fuzzy_vocab_strategy_matches_scan_and_plan(spark, documents):
    """The vocab candidate-index path (edit distance over distinct tokens,
    matches equi-joined back) returns IDENTICAL rows to the direct
    theta-join, and its per-occurrence join is a broadcast hash
    equi-join (codegen), not a nested-loop levenshtein over every
    occurrence."""
    from data_text_search_spark.plans.explain_tools import executed_plan

    q = "tabel scann"
    vocab_df = fuzzy.fuzzy_search(spark, documents, q, 1, strategy="vocab")
    scan_df = fuzzy.fuzzy_search(spark, documents, q, 1, strategy="scan")
    key = ["doc_id", "match_count", "n_chars", "score", "score_abs"]
    a = sorted(map(tuple, vocab_df.select(key).collect()))
    b = sorted(map(tuple, scan_df.select(key).collect()))
    assert a == b and len(a) > 0
    plan = executed_plan(vocab_df)
    # occurrences attach through an equi-join; exactly one nested-loop
    # (the vocab-sized theta-join) remains
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # the scan form has no hash join at all — the pin is meaningful
    assert "BroadcastHashJoin" not in executed_plan(scan_df)


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
    # 8 wide bands over the 64-bit signature: recall should be solid on
    # the driver corpus (planted near-dup clusters)
    assert len(lsh) >= 0.8 * len(exact), (len(lsh), len(exact))


def test_semdedup_single_cluster_equals_exact(embeddings):
    """With n_clusters=1 every row shares the one cluster, so SemDeDup
    degenerates to the exact all-pairs computation — identical pairs AND
    identical rounded cosines (pins arithmetic/rounding parity with
    cosine_dup_pairs, the certificate's anti-join key)."""
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             similarity.cosine_dup_pairs(embeddings, threshold=0.5).collect()}
    sem = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           similarity.semdedup_pairs(embeddings, threshold=0.5,
                                     n_clusters=1).collect()}
    assert sem == exact
    assert len(sem) > 0


def test_semdedup_precision_and_planted_recall(spark, embeddings):
    """Clustered SemDeDup: perfect precision (subset of exact with equal
    cosines) on the raw table, and planted noisy copies (cos ~0.97) are
    found — each lands in its base vector's cluster at k=8 over 500+20
    rows. Zero-vector rows must not crash the normalize."""
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             similarity.cosine_dup_pairs(embeddings, threshold=0.5).collect()}
    sem = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           similarity.semdedup_pairs(embeddings, threshold=0.5,
                                     n_clusters=8).collect()}
    assert set(sem) <= set(exact)
    for k, v in sem.items():
        assert exact[k] == v
    rows = embeddings.orderBy("vec_id").limit(20).collect()
    rs = np.random.RandomState(11)
    planted = []
    for i, r in enumerate(rows):
        v = np.asarray(r["embedding"], dtype=np.float64)
        noisy = v + rs.standard_normal(v.size) * 0.1 * np.linalg.norm(v) / np.sqrt(v.size)
        planted.append((900_000 + i, [float(x) for x in noisy]))
    planted.append((900_099, [0.0] * len(rows[0]["embedding"])))
    big = embeddings.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted,
                              "vec_id long, embedding array<double>"))
    got = {(r["id_a"], r["id_b"]) for r in
           similarity.semdedup_pairs(big, threshold=0.8,
                                     n_clusters=8).collect()}
    found = sum(int((int(r["vec_id"]), 900_000 + i) in got)
                for i, r in enumerate(rows))
    assert found >= 18, f"planted-copy recall {found}/20"


def test_semdedup_cluster_cap_deterministic(embeddings):
    """cluster_cap bounds the quadratic term: capped output is a subset
    of uncapped (recall-only effect) and is stable across runs."""
    full = {(r["id_a"], r["id_b"]) for r in
            similarity.semdedup_pairs(embeddings, threshold=0.5,
                                      n_clusters=4).collect()}
    cap1 = {(r["id_a"], r["id_b"]) for r in
            similarity.semdedup_pairs(embeddings, threshold=0.5,
                                      n_clusters=4, cluster_cap=100).collect()}
    cap2 = {(r["id_a"], r["id_b"]) for r in
            similarity.semdedup_pairs(embeddings, threshold=0.5,
                                      n_clusters=4, cluster_cap=100).collect()}
    assert cap1 <= full and cap1 == cap2


def test_cosine_dup_pairs_block_equals_broadcast(embeddings):
    """The distributed block-matmul path (no driver collect) must equal
    the broadcast path exactly — same pairs, same rounded cosines."""
    bc = {(r["id_a"], r["id_b"]): r["cosine"] for r in
          similarity.cosine_dup_pairs(embeddings, threshold=0.5,
                                      strategy="broadcast").collect()}
    blk = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           similarity.cosine_dup_pairs(embeddings, threshold=0.5,
                                       strategy="block",
                                       block_rows=100).collect()}
    assert bc == blk
    assert len(blk) > 0


def test_embed_corpus_broadcast_path(spark):
    """The broadcast-model mapInPandas pass: a second embedder-protocol
    implementation drops in, extra columns pass through, vectors match
    driver-side encode. (The class lives in the engine package: broadcast
    pickles by reference and executors re-import it.)"""
    ToyModel = semantic.LengthBucketEmbedder
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": ["a", "bb", "ccc"],
                        "extra": ["x", "y", "z"]})
    got = (semantic.embed_corpus(spark.createDataFrame(pdf), "text",
                                 embedder=ToyModel())
           .orderBy("doc_id").collect())
    want = ToyModel().encode(pdf["text"].tolist())
    assert [r["extra"] for r in got] == ["x", "y", "z"]
    for r, w in zip(got, want):
        assert np.allclose(r["embedding"], w)


def test_fuzzy_row_cap_guard(spark):
    """Z4: opt-in reference refusal over max_rows; off by default."""
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(20), "text": ["some words here"] * 20}))
    with pytest.raises(ValueError, match="more than 10 rows"):
        fuzzy.fuzzy_search(spark, df, "words", 1, max_rows=10)
    assert fuzzy.fuzzy_search(spark, df, "words", 1).count() == 20


def test_persisted_signature_reused(embeddings):
    """with_signature-at-embed-time reuse: identical results, and the
    plan contains NO signature UDF (the persisted column is used)."""
    signed = similarity.with_signature(embeddings).cache()
    qv = [float(v) for v in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    fresh = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             similarity.lsh_dup_pairs(embeddings, threshold=0.5).collect()}
    reused = {(r["id_a"], r["id_b"]): r["cosine"] for r in
              similarity.lsh_dup_pairs(signed, threshold=0.5).collect()}
    assert fresh == reused
    a = [r["vec_id"] for r in
         similarity.lsh_ann_topk(embeddings, qv, k=10).collect()]
    b = [r["vec_id"] for r in
         similarity.lsh_ann_topk(signed, qv, k=10).collect()]
    assert a == b
    # plan check on a materialized signed table (no UDF in lineage):
    # the persisted column must be used — no signature UDF in the plan
    spark = embeddings.sparkSession
    mat = spark.createDataFrame(signed.toPandas())
    plan = similarity.lsh_ann_topk(mat, qv, k=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "sig64_udf" not in plan and "ArrowEvalPython" not in plan
    signed.unpersist()


# ------------------------------------------- round-3 shuffle-shape guards

def test_minhash_sig_prefilter_preserves_pairs(documents):
    """The signature-estimate pre-filter must not change the output on a
    real corpus (it only prunes candidates far below the threshold)."""
    base = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
            dedup.minhash_lsh_pairs(documents, threshold=0.5,
                                    sig_prefilter_margin=None).collect()}
    pre = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
           dedup.minhash_lsh_pairs(documents, threshold=0.5,
                                   sig_prefilter_margin=0.2).collect()}
    assert pre == base


def test_simhash_bucket_cap_bounds_degenerate_corpus(spark):
    """A boilerplate class (identical fingerprints) must not emit M²/2
    join rows when capped; distinct near-dup pairs still surface."""
    boiler = ["copyright header license boilerplate text"] * 100
    texts = boiler + ["unique quantum flux capacitor engaged"] * 2
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    uncapped = dedup.simhash_pairs(df, max_hamming=3, bucket_cap=None)
    capped = dedup.simhash_pairs(df, max_hamming=3, bucket_cap=50)
    got_un = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    got_cap = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    boiler_pairs = {p for p in got_un if p[0] < 100 and p[1] < 100}
    assert len(boiler_pairs) == 100 * 99 // 2  # degenerate class all-pairs
    # cap drops EXACTLY the pairs whose every shared band is
    # oversubscribed — the boilerplate class — and nothing else
    assert got_cap == got_un - boiler_pairs
    assert (100, 101) in got_cap  # the planted near-dup survives


def test_lsh_dup_band_exchange_carries_no_vectors(embeddings):
    """The 8-way band fan-out/self-join must shuffle only (id, sig) —
    vectors are re-attached per surviving candidate pair."""
    import re

    from data_text_search_spark.plans.explain_tools import formatted_plan
    plan = formatted_plan(similarity.lsh_dup_pairs(embeddings, threshold=0.5))
    blocks = re.split(r"\n\(\d+\) ", plan)
    band_ex = [b for b in blocks
               if b.startswith("Exchange") and "hashpartitioning(band" in b]
    assert band_ex, "expected band/bucket exchanges in the plan"
    for b in band_ex:
        assert not re.search(r"[\[, ](v|va|vb|embedding)#", b), b


# -------------------------------------------------------- batch knn / ann

def test_knn_join_block_equals_broadcast(embeddings):
    """The 2-D blocked scale path must return byte-identical rows to the
    broadcast path, including tie order, even with many small blocks."""
    left = embeddings.filter("vec_id < 40")
    b = similarity.knn_join(left, embeddings, k=7, exclude_self=True,
                            strategy="broadcast").collect()
    k = similarity.knn_join(left, embeddings, k=7, exclude_self=True,
                            strategy="block", block_rows=64,
                            max_blocks=8).collect()
    assert [tuple(r) for r in b] == [tuple(r) for r in k]


def test_knn_join_matches_cosine_topk_per_query(embeddings):
    """Each query's knn_join slice equals the single-query cosine_topk
    answer (ids and rounded scores) — the batch kernel is just N single
    queries fused into one matmul."""
    got = similarity.knn_join(embeddings.filter("vec_id < 3"), embeddings,
                              k=6, exclude_self=False).collect()
    for qid in range(3):
        qv = [float(v) for v in
              embeddings.filter(f"vec_id = {qid}").first()["embedding"]]
        want = [(r["vec_id"], r["score"]) for r in
                similarity.cosine_topk(embeddings, qv, k=6).collect()]
        assert [(r["vec_id"], r["score"]) for r in got
                if r["qid"] == qid] == want


def test_knn_join_exclude_self_and_row_counts(embeddings):
    left = embeddings.filter("vec_id < 10")
    out = similarity.knn_join(left, embeddings, k=4,
                              exclude_self=True).collect()
    assert len(out) == 10 * 4
    assert all(r["qid"] != r["vec_id"] for r in out)
    # scores within each qid are non-increasing
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["score"])
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)


def test_ann_batch_matches_single_query(spark, embeddings, tmp_path):
    """The batched multi-probe index search returns, per qid, exactly the
    rows the single-query path returns — same candidates (hamming cutoff
    + lowest-hamming shortlist), same exact rescoring, same tie order."""
    root = str(tmp_path / "ann")
    similarity.build_ann_index(embeddings, root)
    queries = embeddings.filter("vec_id < 6").select(
        F.col("vec_id").alias("qid"), "embedding")
    batch = similarity.ann_index_search_batch(spark, root, queries,
                                              k=10).collect()
    for qid in range(6):
        qv = [float(v) for v in
              embeddings.filter(f"vec_id = {qid}").first()["embedding"]]
        single = [(r["vec_id"], r["score"]) for r in
                  similarity.ann_index_search(spark, root, qv, k=10).collect()]
        assert [(r["vec_id"], r["score"]) for r in batch
                if r["qid"] == qid] == single


# ------------------------------------------------- cluster resolution

def test_dup_clusters_components(spark):
    """Chain, triangle, pair, and a disconnected singleton-free graph:
    every vertex gets the smallest reachable id as cluster_id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long")
    got = sorted(tuple(r) for r in dedup.dup_clusters(pairs).collect())
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)]


def test_dup_clusters_long_chain_pointer_doubling(spark):
    """A 64-vertex chain must converge well inside max_iter=10 — the
    shortcutting term gives O(log n) rounds, not O(diameter)."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(63)],
                                  "doc_a long, doc_b long")
    cc = dedup.dup_clusters(pairs, max_iter=10,
                            driver_max_edges=0).collect()
    assert len(cc) == 64
    assert all(r["cluster_id"] == 0 for r in cc)


def test_dedup_keep_canonical(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (20, 21)],
                                  "doc_a long, doc_b long")
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 5, 20, 21, 99]],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  dedup.dedup_keep_canonical(docs, pairs).collect())
    assert kept == [1, 5, 20, 99]


def test_dup_clusters_driver_equals_distributed(spark):
    """The size-gated union-find path and the label-propagation path
    must return identical rows on the same graph."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
         (30, 31), (31, 32), (32, 30), (5, 40)],
        "doc_a long, doc_b long")
    drv = sorted(tuple(r) for r in dedup.dup_clusters(pairs).collect())
    dist = sorted(tuple(r) for r in
                  dedup.dup_clusters(pairs, driver_max_edges=0).collect())
    assert drv == dist


def test_dup_clusters_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.dup_clusters(pairs).count() == 0


def test_ann_batch_scan_is_bucket_pruned_and_probe_broadcast(spark, embeddings, tmp_path):
    """The batched path keeps the single-query scan shape: the index
    read carries PartitionFilters on `bucket` (union of probed buckets,
    driver-bounded by 2^bucket_bits), and the probe table reaches the
    index via a broadcast join — index rows never shuffle."""
    import re
    root = str(tmp_path / "annbatchplan")
    similarity.build_ann_index(embeddings, root)
    queries = embeddings.filter("vec_id < 4").select(
        F.col("vec_id").alias("qid"), "embedding")
    plan = similarity.ann_index_search_batch(
        spark, root, queries, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_keep_canonical_broadcasts_drop_list(spark):
    """The corpus side of the canonical keep must not shuffle: the
    (small) loser list reaches it as a broadcast LeftAnti join."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)],
                                 "doc_id long, text string")
    plan = dedup.dedup_keep_canonical(docs, pairs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


# ------------------------------------------------------------ IVF index

def test_ivf_full_probe_is_brute_force(spark, embeddings, tmp_path):
    root = str(tmp_path / "ivf")
    similarity.build_ivf_index(embeddings, root, n_centroids=16)
    qv = [float(v) for v in
          embeddings.filter("vec_id = 7").first()["embedding"]]
    full = [(r["vec_id"], r["score"]) for r in
            similarity.ivf_search(spark, root, qv, k=10, nprobe=16).collect()]
    brute = [(r["vec_id"], r["score"]) for r in
             similarity.cosine_topk(embeddings, qv, k=10).collect()]
    assert full == brute


def test_ivf_partial_probe_scores_exact_and_pruned(spark, embeddings, tmp_path):
    import re
    root = str(tmp_path / "ivfp")
    similarity.build_ivf_index(embeddings, root, n_centroids=16)
    qv = [float(v) for v in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    brute = {r["vec_id"]: r["score"] for r in
             similarity.cosine_topk(embeddings, qv, k=500).collect()}
    res = similarity.ivf_search(spark, root, qv, k=10, nprobe=2)
    got = res.collect()
    assert got and all(brute[r["vec_id"]] == r["score"] for r in got)
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan


def test_ivf_recall_on_planted_near_dups(spark, tmp_path):
    """k-means cells must put a vector and its tiny perturbation in the
    same (or a probed) cell: every planted near-dup is recovered at
    nprobe=4 of 16."""
    rng = np.random.RandomState(11)
    base = rng.randn(400, 32)
    rows = [(i, [float(v) for v in base[i]]) for i in range(400)]
    rows += [(1000 + i, [float(v) for v in base[i] + 1e-4 * rng.randn(32)])
             for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    root = str(tmp_path / "ivfr")
    similarity.build_ivf_index(df, root, n_centroids=16)
    hit = 0
    for i in range(20):
        qv = rows[400 + i][1]
        got = [r["vec_id"] for r in
               similarity.ivf_search(spark, root, qv, k=3, nprobe=4).collect()]
        hit += (i in got) or (1000 + i in got[:1])
    assert hit == 20


def test_ivf_deterministic_rebuild(spark, embeddings, tmp_path):
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    similarity.build_ivf_index(embeddings, r1, n_centroids=8)
    similarity.build_ivf_index(embeddings, r2, n_centroids=8)
    a = sorted(tuple(r) for r in
               spark.read.parquet(r1).select("vec_id", "cell").collect())
    b = sorted(tuple(r) for r in
               spark.read.parquet(r2).select("vec_id", "cell").collect())
    assert a == b


# ---------------------------------------------------------- hybrid RRF

def test_rrf_fuse_semantics(spark):
    """A doc on both lists beats any single-list doc at these depths;
    rrf_score is exactly the sum of reciprocal terms; n_lists counts
    the lists that retrieved the doc."""
    from data_text_search_spark.operators import hybrid
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in
           hybrid.rrf_fuse([a, b], k=10).collect()}
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got[1] == (round(1 / 61, 6), 1)
    top = hybrid.rrf_fuse([a, b], k=1).collect()[0]
    assert top["doc_id"] == 3


def test_rrf_fuse_batch_partitioned(spark):
    """Batch mode: per-query windows — each query fuses independently
    and k applies per query."""
    from data_text_search_spark.operators import hybrid
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (1, 5, 1)],
        "query_id int, doc_id long, rank int")
    b = spark.createDataFrame(
        [(0, 2, 1), (1, 6, 1)], "query_id int, doc_id long, rank int")
    out = hybrid.rrf_fuse([a, b], k=1, partition_cols=["query_id"]).collect()
    by_q = {r["query_id"]: r["doc_id"] for r in out}
    assert by_q == {0: 2, 1: 5}  # q0: doc2 on both lists; q1: tie -> min id


def test_with_rank_deterministic(spark):
    from data_text_search_spark.operators import hybrid
    df = spark.createDataFrame([(1, 2.0), (2, 2.0), (3, 1.0)],
                               "doc_id long, score double")
    got = {r["doc_id"]: r["rank"] for r in
           hybrid.with_rank(df, [F.desc("score"), F.asc("doc_id")]).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_ivf_batch_matches_single_query(spark, embeddings, tmp_path):
    """Batched IVF returns per qid exactly what the single-query path
    returns — same probed cells (sim desc, cell asc order), same exact
    rescoring, same tie order."""
    root = str(tmp_path / "ivfb")
    similarity.build_ivf_index(embeddings, root, n_centroids=16)
    queries = embeddings.filter("vec_id < 6").select(
        F.col("vec_id").alias("qid"), "embedding")
    batch = similarity.ivf_search_batch(spark, root, queries,
                                        k=8, nprobe=3).collect()
    for qid in range(6):
        qv = [float(v) for v in
              embeddings.filter(f"vec_id = {qid}").first()["embedding"]]
        single = [(r["vec_id"], r["score"]) for r in
                  similarity.ivf_search(spark, root, qv, k=8,
                                        nprobe=3).collect()]
        assert [(r["vec_id"], r["score"]) for r in batch
                if r["qid"] == qid] == single


# ----------------------------------------------------- hash sampling

def test_hash_sample_deterministic_and_stable_under_growth(spark):
    """Same rows on every call; adding rows never changes which old
    rows are sampled (content-addressed, not positional)."""
    from data_text_search_spark.operators import sampling
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in sampling.hash_sample(small, 0.2).collect()}
    s2 = {r["doc_id"] for r in sampling.hash_sample(small, 0.2).collect()}
    sb = {r["doc_id"] for r in sampling.hash_sample(big, 0.2).collect()}
    assert s1 == s2
    assert {d for d in sb if d < 500} == s1
    assert 0.1 < len(s1) / 500 < 0.3  # ~fraction, hash-binomial
    # different salt -> a different (roughly independent) sample
    s3 = {r["doc_id"] for r in
          sampling.hash_sample(small, 0.2, salt="x").collect()}
    assert s3 != s1


def test_hash_split_total_and_disjoint(spark):
    from data_text_search_spark.operators import sampling
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(df, {"train": 0.8, "val": 0.1,
                                   "test": 0.1}).collect()
    assert len(out) == 1000  # total: every row assigned exactly once
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 700 < counts["train"] < 900
    # fraction=1.0 single split; bad fractions rejected
    one = sampling.hash_split(df, {"all": 1.0}).select("split").distinct()
    assert [r["split"] for r in one.collect()] == ["all"]
    with pytest.raises(ValueError):
        sampling.hash_split(df, {})


def test_hash_sample_is_pure_expression(spark):
    """No shuffle, no UDF: the filter is a plain projection-level
    expression (whole-stage-codegen-friendly)."""
    from data_text_search_spark.operators import sampling
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = sampling.hash_sample(df, 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_hash_sample_and_split_are_decorrelated(spark):
    """Domain separation: a 50% sample then an 80/10/10 split must put
    sampled rows in ALL splits (same-hash correlation would put every
    sampled row in train)."""
    from data_text_search_spark.operators import sampling
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    sampled = sampling.hash_sample(df, 0.5)
    out = sampling.hash_split(sampled, {"train": 0.8, "val": 0.1,
                                        "test": 0.1}).collect()
    splits = {r["split"] for r in out}
    assert splits == {"train", "val", "test"}


def test_hash_sample_zero_and_split_sum_validation(spark):
    """fraction=0 keeps NOTHING (an inclusive <= '00000000' bound would
    keep the ~2^-32 of rows hashing to exactly zero — at 10^12 rows
    that's a few hundred ghosts in a 'no sample'), and a split spec
    whose fractions don't sum to 1 is rejected instead of silently
    handing the last split the remainder."""
    from data_text_search_spark.operators import sampling
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    assert sampling.hash_sample(df, 0.0).count() == 0
    assert sampling.hash_sample(df, 1.0).count() == 2000
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(df, {"train": 0.6, "test": 0.6})
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(df, {"train": 0.25, "val": 0.25})


def test_dedup_keep_canonical_shuffle_fallback_identical(spark):
    """Above the broadcast gate the loser anti-join runs as a plain
    shuffle join (a forced broadcast of an unbounded drop-list would
    collect it to the driver) — identical rows either way."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (20, 21)],
                                  "doc_a long, doc_b long")
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 5, 20, 21, 99]],
        "doc_id long, text string")
    bcast = sorted(r["doc_id"] for r in
                   dedup.dedup_keep_canonical(docs, pairs).collect())
    shuf = sorted(r["doc_id"] for r in
                  dedup.dedup_keep_canonical(
                      docs, pairs, broadcast_max_rows=0).collect())
    assert bcast == shuf == [1, 5, 20, 99]


def test_knn_join_empty_right(spark):
    """An empty right table yields a typed empty result, not a numpy
    AxisError from norm(axis=1) on a 1-D empty array."""
    from data_text_search_spark.operators import similarity
    left = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                                 "vec_id long, embedding array<double>")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = similarity.knn_join(left, empty, k=3)
    assert out.columns == ["qid", "vec_id", "score"]
    assert out.count() == 0


def test_build_ivf_index_empty_input_raises(spark, tmp_path):
    from data_text_search_spark.operators import similarity
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="training sample is empty"):
        similarity.build_ivf_index(empty, str(tmp_path / "ivf_empty"))


def test_unigram_rarity_semantics(spark):
    """Boilerplate built from hot tokens scores LOW rarity; a doc of
    corpus-rare tokens scores HIGH; empty docs keep a (0, 0, 0.0) row;
    a non-binding vocab cap changes nothing."""
    from data_text_search_spark.operators import textstats
    hot = "the the the and and of"
    df = spark.createDataFrame(
        [(1, f"{hot} {hot} {hot}"),
         (2, "zyzzyva quokka obelisk xylophone"),
         (3, hot),
         (4, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.unigram_rarity(df).collect()}
    assert out[1]["rarity"] < out[2]["rarity"]
    assert out[3]["rarity"] < out[2]["rarity"]
    assert out[4]["n_tokens"] == 0 and out[4]["sum_tf"] == 0
    assert out[4]["rarity"] == 0.0
    # integer backbone: doc 2's four singletons sum to 4
    assert out[2]["sum_tf"] == 4
    capped = {r["doc_id"]: r for r in
              textstats.unigram_rarity(df, vocab_max_terms=100).collect()}
    assert all(tuple(capped[d]) == tuple(out[d]) for d in out)


def test_stratified_sample(spark):
    """Per-group fractions honored (1.0 keeps all of its group, 0.0 and
    the default drop), samples are deterministic and decorrelated from
    hash_sample, and the plan stays a pure projection filter."""
    from data_text_search_spark.operators import sampling
    df = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else ("zh" if i % 3 == 1 else "de"))
         for i in range(900)], "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, {"en": 0.5, "zh": 1.0}, group_col="lang")
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by.get("zh", set())) == 300          # fraction 1.0: all
    assert "de" not in by                           # default 0.0: none
    assert 100 < len(by.get("en", set())) < 200     # ~50% of 300
    again = {r["doc_id"] for r in sampling.stratified_sample(
        df, {"en": 0.5, "zh": 1.0}, group_col="lang").collect()}
    assert again == {r["doc_id"] for r in rows}     # deterministic
    # decorrelated from the sample| domain at the same fraction
    s = {r["doc_id"] for r in
         sampling.hash_sample(df.filter("lang = 'en'"), 0.5).collect()}
    assert s != by["en"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, {"en": 1.5}, group_col="lang")
