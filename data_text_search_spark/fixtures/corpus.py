"""Deterministic synthetic source-code corpus (north-rule input shape).

Schema mandated by BASELINE.json input_hint:
    (repo STRING, path STRING, commit STRING, lang STRING, content STRING)
plus derived doc_id / content_sha256 computed by the ingest stage.

Generation is a pure function of doc_id (seed folded in), so the
driver-side pandas build and the distributed mapInPandas build produce
byte-identical rows regardless of partitioning / parallelism — which is
what makes doc_ids and golden scores stable across local[8] vs local[32]
runs (north-rule scaling evidence) and across resume runs.

Content is code-like text sampled Zipfian from a ~500-token vocabulary
(hot-term skew is the point — it exercises the salted posting build),
20..~2000 tokens per doc, with planted needle phrases for golden
queries and a few docs carrying the reference clean-pipeline triggers
(clean_funcs.py:23-32) and edge cases (empty / 1-token / punct-only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

_KEYWORDS = (
    "def class return import from for while if else elif try except raise with as "
    "lambda yield assert pass break continue global del not and or in is none true false "
    "fn let mut pub impl struct enum match trait use mod async await static const "
    "public private void int long float double string bool var val object extends "
    "override final package interface throws new this super select from where group by "
    "order join left inner outer on having limit union insert update delete create table"
).split()

_IDENTS = [
    f"{a}_{b}"
    for a in ("get", "set", "build", "parse", "read", "write", "merge", "split",
              "encode", "decode", "hash", "index", "query", "score", "token",
              "batch", "block", "shard", "spill", "flush", "scan", "emit")
    for b in ("row", "col", "doc", "term", "list", "map", "buf", "node", "tree",
              "heap", "page", "file", "path", "key", "val", "ctx", "cfg", "ptr")
]

_PUNCT = list("()[]{}=+-*/<>.,:;")

VOCAB: list[str] = _KEYWORDS + _IDENTS + _PUNCT
# rare tail terms: appear only via planted needles / rare sampling
RARE_TERMS = ["zyzzyva", "quokka", "hapax", "xylophone", "obelisk"]
VOCAB = VOCAB + RARE_TERMS

_EXTS = [("py", "python"), ("java", "java"), ("scala", "scala"),
         ("rs", "rust"), ("go", "go"), ("md", "markdown")]

# Zipfian probabilities over the vocab (rank 1 hottest)
_RANKS = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
_PROBS = (1.0 / _RANKS) / np.sum(1.0 / _RANKS)

# planted needle phrases → golden multi-token queries
# phrase -> (modulus, residue): planted in docs where doc_id % modulus == residue
NEEDLES = {
    "quantum flux capacitor": (97, 3),
    "lazy evaluation ladder": (131, 5),
    "zyzzyva obelisk": (211, 7),
}

# canonical bundled query set (FIXTURES.md §2); k=10 everywhere
QUERIES: list[dict] = [
    {"query_id": 0, "query_text": "return"},                      # hot single term
    {"query_id": 1, "query_text": "zyzzyva"},                     # rare single term
    {"query_id": 2, "query_text": "quantum flux capacitor"},      # planted needle
    {"query_id": 3, "query_text": "lazy evaluation ladder"},      # planted needle
    {"query_id": 4, "query_text": "merge_heap spill_page"},       # mid-freq idents
    {"query_id": 5, "query_text": "notinthecorpusatall"},         # absent term
    {"query_id": 6, "query_text": "RETURN Import"},               # uppercase → lowercase path
    {"query_id": 7, "query_text": "select select select"},        # duplicate tokens (each occurrence scores)
    {"query_id": 8, "query_text": "index(scan)"},                 # punctuation splits
    {"query_id": 9, "query_text": "quokka hapax xylophone"},      # rare multi
    {"query_id": 10, "query_text": "def return import from"},     # all-hot (negative idf territory)
    {"query_id": 11, "query_text": "encode_block decode_block"},
]


def _doc_row(doc_id: int) -> dict:
    rs = np.random.RandomState(SEED * 1_000_003 + doc_id)
    repo = f"org{doc_id % 7}/repo{doc_id % 23}"
    ext, lang = _EXTS[doc_id % len(_EXTS)]
    path = f"src/d{doc_id % 13}/f{doc_id}.{ext}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]

    # edge cases on the first few docs
    if doc_id == 0:
        content = ""
    elif doc_id == 1:
        content = "singleton"
    elif doc_id == 2:
        content = "... !!! ???"
    elif doc_id == 3:
        content = ("<p>Hello</p> &nbsp; subject: quarterly update "
                   "contact bob@example.com kind regards bob")
    else:
        # lognormal length, clipped to [20, 2000]
        n = int(np.clip(rs.lognormal(mean=5.0, sigma=0.8), 20, 2000))
        toks = rs.choice(len(VOCAB), size=n, p=_PROBS)
        words = [VOCAB[t] for t in toks]
        for needle, (mod, res) in NEEDLES.items():
            if doc_id % mod == res:
                words.append(needle)
        content = " ".join(words)
    return {"repo": repo, "path": path, "commit": commit, "lang": lang,
            "content": content}


def corpus_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side build (tests / oracle). doc_id order == row order."""
    return pd.DataFrame([_doc_row(i) for i in range(n_docs)])


def corpus_df(spark, n_docs: int, partitions: int | None = None):
    """Distributed build: mapInPandas over spark.range — identical rows to
    corpus_pandas for every doc_id, any partitioning."""
    import pyspark.sql.functions as F  # noqa: F401

    schema = ("doc_id long, repo string, path string, commit string, "
              "lang string, content string")

    def gen(batches):
        for pdf in batches:
            rows = [{"doc_id": int(i), **_doc_row(int(i))} for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "repo", "path",
                                              "commit", "lang", "content"])

    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=schema)
