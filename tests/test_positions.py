"""Positional postings sidecar: codec roundtrip, phrase parity vs the
corpus-scan twin, span_near vs python truth, and the multi-shard
partition-ordering regression."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from data_text_search_spark.functions.text import tokenize_py
from data_text_search_spark.operators import fuzzy
from data_text_search_spark.operators import positions as P

PHRASES = ["def def", "class def", "def class def", "zzz qqq", ""]


@pytest.fixture(scope="module")
def pos_root(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pos") / "pos")
    # shards=8 over cores=8 → several shards per partition at query
    # time, which exercises the interleaved-doc-range sort in
    # _decode_term (the bug class this suite pins)
    m = P.build_positions(
        spark, corpus.selectExpr("doc_id", "content as text"), root,
        shards=8)
    assert m["complete"] and m["n_docs"] == 300
    return root


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    rows = []
    for doc in range(300):
        for term in ("a", "b"):
            k = int(rng.integers(1, 9))
            pos = np.unique(rng.integers(1, 500, size=k)).tolist()
            rows.append({"doc_id": doc * 3 + 1, "term": term,
                         "pos": pos, "shard": 0})
    pdf = pd.DataFrame(rows)
    enc = P._encode_positions_shard(pdf)
    # every term decodes back to exactly what went in
    for term in ("a", "b"):
        sub = pdf[pdf["term"] == term].sort_values("doc_id")
        docs, offs, positions = P._decode_term(
            enc[enc["term"] == term].reset_index(drop=True))
        assert docs.tolist() == sub["doc_id"].tolist()
        for i, want in enumerate(sub["pos"]):
            assert positions[offs[i]:offs[i + 1]].tolist() == want


def test_decode_term_sorts_interleaved_blocks():
    # two shards with interleaved doc-id ranges concatenated unsorted —
    # the production shape after repartition (doc-hash sharding)
    a = pd.DataFrame([{"doc_id": d, "term": "t", "pos": [d], "shard": 0}
                      for d in (2, 5, 9)])
    b = pd.DataFrame([{"doc_id": d, "term": "t", "pos": [d * 10], "shard": 1}
                      for d in (1, 4, 7)])
    enc = pd.concat([P._encode_positions_shard(a),
                     P._encode_positions_shard(b)], ignore_index=True)
    docs, offs, positions = P._decode_term(enc)
    assert docs.tolist() == [1, 2, 4, 5, 7, 9]
    got = {int(d): positions[offs[i]:offs[i + 1]].tolist()
           for i, d in enumerate(docs)}
    assert got == {2: [2], 5: [5], 9: [9], 1: [10], 4: [40], 7: [70]}


@pytest.mark.parametrize("phrase", PHRASES, ids=repr)
def test_phrase_parity_vs_corpus_scan(spark, corpus, pos_root, phrase):
    got = [(r["doc_id"], r["phrase_count"])
           for r in P.phrase_count(spark, pos_root, phrase).collect()]
    want = [(r["doc_id"], r["phrase_count"])
            for r in fuzzy.phrase_search(
                spark, corpus.selectExpr("doc_id", "content as text"),
                phrase).collect()]
    assert got == want


def test_span_near_vs_python_truth(spark, corpus_pdf, pos_root):
    t1, t2, slop = "def", "class", 4
    truth = []
    for did, text in enumerate(corpus_pdf["content"]):
        tk = tokenize_py(text)
        p1 = [i + 1 for i, x in enumerate(tk) if x == t1]
        p2 = [i + 1 for i, x in enumerate(tk) if x == t2]
        if p1 and p2:
            d = min(abs(a - b) for a in p1 for b in p2)
            if d <= slop:
                truth.append((did, d))
    truth.sort(key=lambda x: (x[1], x[0]))
    got = [(r["doc_id"], r["min_dist"])
           for r in P.span_near(spark, pos_root, t1, t2, slop).collect()]
    assert got == truth and len(got) > 0


def test_span_near_absent_term(spark, pos_root):
    assert P.span_near(spark, pos_root, "def", "zzznope", 5).count() == 0


def test_tokenizer_mismatch_refused(spark, pos_root, tmp_path):
    import shutil
    bad = str(tmp_path / "bad")
    shutil.copytree(pos_root, bad)
    m = json.load(open(f"{bad}/manifest.json"))
    m["tokenizer"] = "OTHER_SPEC"
    json.dump(m, open(f"{bad}/manifest.json", "w"))
    with pytest.raises(ValueError, match="tokenizer mismatch"):
        P.phrase_count(spark, bad, "def def").collect()


def test_incomplete_sidecar_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="no complete positions"):
        P.phrase_count(spark, str(tmp_path / "nope"), "def").collect()


def test_empty_corpus_sidecar(spark, tmp_path):
    root = str(tmp_path / "empty")
    P.build_positions(
        spark, spark.createDataFrame([], "doc_id long, text string"), root)
    assert P.phrase_count(spark, root, "def def").count() == 0
    assert P.span_near(spark, root, "a", "b", 3).count() == 0


def test_span_window_vs_python_truth(spark, corpus_pdf, pos_root):
    from collections import Counter
    terms, width = ["def", "class", "return"], 10
    truth = []
    for did, text in enumerate(corpus_pdf["content"]):
        tk = tokenize_py(text)
        pos = {x: [i + 1 for i, y in enumerate(tk) if y == x]
               for x in terms}
        if not all(pos[x] for x in terms):
            continue
        merged = sorted((p, li) for li, x in enumerate(terms)
                        for p in pos[x])
        mp = [p for p, _ in merged]
        ml = [li for _, li in merged]
        best, have, left = 1 << 60, 0, 0
        need = Counter()
        for right in range(len(mp)):
            if need[ml[right]] == 0:
                have += 1
            need[ml[right]] += 1
            while have == len(terms):
                best = min(best, mp[right] - mp[left])
                need[ml[left]] -= 1
                if need[ml[left]] == 0:
                    have -= 1
                left += 1
        if best < width:
            truth.append((did, best))
    truth.sort(key=lambda x: (x[1], x[0]))
    got = [(r["doc_id"], r["min_span"])
           for r in P.span_window(spark, pos_root, terms, width).collect()]
    assert got == truth and len(got) > 0


def test_phrase_prefix_vs_python_truth(spark, corpus, corpus_pdf, pos_root):
    from collections import Counter
    uni = Counter()
    for t in corpus_pdf["content"]:
        uni.update(tokenize_py(t))
    fixed, pre = "def", "re"
    exps = set(sorted((x for x in uni if x.startswith(pre)),
                      key=lambda x: (-uni[x], x))[:50])
    truth = {}
    for did, text in enumerate(corpus_pdf["content"]):
        tk = tokenize_py(text)
        c = sum(1 for i in range(len(tk) - 1)
                if tk[i] == fixed and tk[i + 1] in exps)
        if c:
            truth[did] = c
    ts = spark.createDataFrame(sorted(uni.items()), "term string, df long")
    got = {r["doc_id"]: r["phrase_count"]
           for r in P.phrase_prefix_count(spark, pos_root,
                                          f"{fixed} {pre}", ts).collect()}
    assert got == truth and len(got) > 0


def test_phrase_prefix_no_expansions(spark, pos_root, corpus_pdf):
    from collections import Counter
    uni = Counter()
    for t in corpus_pdf["content"]:
        uni.update(tokenize_py(t))
    ts = spark.createDataFrame(sorted(uni.items()), "term string, df long")
    assert P.phrase_prefix_count(spark, pos_root, "def zzzzz",
                                 ts).count() == 0


# ------------------------------------------------------ phrase suggester

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _phrase_suggest_truth(texts, query, n=3, max_edits=2, cand_n=5,
                          backoff=0.4):
    """Independent python reference of the phrase-suggest spec."""
    import itertools
    from collections import Counter
    uni, big, df = Counter(), Counter(), Counter()
    T = 0
    for t in texts:
        tk = tokenize_py(t)
        T += len(tk)
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
        df.update(set(tk))
    cands = []
    for q in tokenize_py(query):
        near = sorted((( _lev(term, q), -df[term], term) for term in df
                       if _lev(term, q) <= max_edits))
        cl = [t for _, _, t in near[:cand_n]]
        if q not in cl:
            cl.append(q)
        cands.append(cl)
    scored = []
    for seq in itertools.product(*cands):
        s = uni.get(seq[0], 0) / T
        for p, w in zip(seq, seq[1:]):
            bg = big.get((p, w), 0)
            s = s * (bg / uni[p]) if bg > 0 else \
                s * (backoff * (uni.get(w, 0) / T))
        scored.append((" ".join(seq), float(s)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:n]


@pytest.fixture(scope="module")
def suggest_env(spark, tmp_path_factory):
    from data_text_search_spark.config import BM25Config
    from data_text_search_spark.operators.index_build import build_index
    from data_text_search_spark.operators.index_query import IndexSearcher
    texts = ["the red fox jumps over the red fox",
             "the red fox runs", "a red ox sleeps by the red fox",
             "fax machine hums", "red fax paper", "an odd bax token"]
    base = tmp_path_factory.mktemp("sugg")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    build_index(spark, df, str(base / "idx"), BM25Config(),
                text_col="text", id_col="doc_id", shards=2, groups=1)
    P.build_positions(spark, df, str(base / "pos"))
    return texts, IndexSearcher(spark, str(base / "idx")), str(base / "pos")


def test_lm_counts_vs_python(spark, suggest_env):
    from collections import Counter
    texts, _, proot = suggest_env
    uni, big = Counter(), Counter()
    for t in texts:
        tk = tokenize_py(t)
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    terms = ["red", "fox", "fax", "zzz"]
    pairs = [("red", "fox"), ("red", "fax"), ("fox", "red"),
             ("zzz", "red")]
    got = P.lm_counts(spark, proot, terms, pairs)
    for t in terms:
        assert got.get((t, ""), 0) == uni.get(t, 0), t
    for p in pairs:
        assert got.get(p, 0) == big.get(p, 0), p


def test_phrase_suggest_vs_python_truth(suggest_env):
    texts, s, proot = suggest_env
    for q, n in [("red fax", 4), ("teh red fix", 3), ("fox", 2),
                 ("zzz qqq", 3)]:
        got = [(r["suggestion"], r["score"])
               for r in s.phrase_suggest(q, proot, n=n).collect()]
        assert got == _phrase_suggest_truth(texts, q, n=n), q
    # the headline behavior: the bigram LM picks the real correction
    top = s.phrase_suggest("red fax", proot, n=1).first()
    assert top["suggestion"] == "red fox"


def test_phrase_suggest_edges(suggest_env):
    texts, s, proot = suggest_env
    assert s.phrase_suggest("", proot).count() == 0
    assert s.phrase_suggest("?!", proot, n=2).count() == 2  # punct tokens
    with pytest.raises(ValueError, match="candidate sequences"):
        s.phrase_suggest(" ".join(["fax"] * 20), proot)


# ------------------------------------------------- incremental segments

def test_positions_segment_equals_rebuild(spark, corpus, tmp_path):
    """Base on half the corpus + one appended segment == full rebuild,
    for every kernel family (phrase, span, LM counts)."""
    half_a = corpus.filter("doc_id % 2 = 0").selectExpr(
        "doc_id", "content as text")
    half_b = corpus.filter("doc_id % 2 = 1").selectExpr(
        "doc_id", "content as text")
    full = corpus.selectExpr("doc_id", "content as text")
    inc, reb = str(tmp_path / "inc"), str(tmp_path / "reb")
    P.build_positions(spark, half_a, inc, shards=4)
    m = P.append_positions_segment(spark, inc, half_b)
    assert m["segments"] == ["s0001"] and m["n_docs"] == 300
    P.build_positions(spark, full, reb, shards=4)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(P.phrase_count(spark, inc, "class def")) == \
        rows(P.phrase_count(spark, reb, "class def"))
    assert rows(P.span_near(spark, inc, "def", "return", 6)) == \
        rows(P.span_near(spark, reb, "def", "return", 6))
    assert P.lm_counts(spark, inc, ["def", "class"],
                       [("class", "def")]) == \
        P.lm_counts(spark, reb, ["def", "class"], [("class", "def")])


def test_positions_segment_guards_and_multi(spark, corpus, tmp_path):
    third = [corpus.filter(f"doc_id % 3 = {i}").selectExpr(
        "doc_id", "content as text") for i in range(3)]
    inc = str(tmp_path / "inc3")
    P.build_positions(spark, third[0], inc, shards=4)
    P.append_positions_segment(spark, inc, third[1])
    m = P.append_positions_segment(spark, inc, third[2])
    assert m["segments"] == ["s0001", "s0002"]
    reb = str(tmp_path / "reb3")
    P.build_positions(
        spark, corpus.selectExpr("doc_id", "content as text"), reb)
    a = sorted(tuple(r) for r in
               P.phrase_count(spark, inc, "def def").collect())
    b = sorted(tuple(r) for r in
               P.phrase_count(spark, reb, "def def").collect())
    assert a == b and a
    # empty batch: no-op, no new segment
    empty = spark.createDataFrame([], "doc_id long, text string")
    m2 = P.append_positions_segment(spark, inc, empty)
    assert m2["segments"] == ["s0001", "s0002"]
    with pytest.raises(ValueError, match="no complete positions"):
        P.append_positions_segment(spark, str(tmp_path / "nope"), empty)
