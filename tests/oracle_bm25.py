"""Pure-Python oracle: faithful re-implementation of the reference BM25.

Every formula carries a citation into /root/reference (read-only, public).
This is the executable stand-in for the reference, which cannot run in
this sandbox (gradio/spacy/torch absent, no network). The engine's
distributed results must be rank-identical to this oracle.

Reference class: search_funcs/bm25_functions.py:25-210 (derived from
Inspirateur/Fast-BM25). NOT copied — re-derived line-by-line as a spec.
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict

from data_text_search_spark.functions.text import clean_py, tokenize_py


class OracleBM25:
    """dict-of-dicts BM25 index, matching reference semantics exactly.

    t2d / idf / doc_len / avgdl per bm25_functions.py:61-91.
    """

    def __init__(self, corpus: list[list[str]], k1: float = 1.5, b: float = 0.75,
                 alpha: float = -math.inf):
        self.k1, self.b, self.alpha = k1, b, alpha
        self.doc_len: list[int] = []
        self.t2d: dict[str, dict[int, int]] = {}
        for i, document in enumerate(corpus):
            # per-doc length: bm25_functions.py:81
            self.doc_len.append(len(document))
            # term-frequency agg: bm25_functions.py:83-88
            for word in document:
                self.t2d.setdefault(word, {}).setdefault(i, 0)
                self.t2d[word][i] += 1
        self.corpus_size = len(self.doc_len)
        # avgdl: bm25_functions.py:91
        self.avgdl = sum(self.doc_len) / len(self.doc_len) if self.doc_len else 0.0
        # unsmoothed Robertson IDF + alpha cutoff: bm25_functions.py:92-102
        # (idf may be negative; terms with idf <= alpha are deleted)
        self.idf: dict[str, float] = {}
        for word, docs in list(self.t2d.items()):
            idf = math.log(self.corpus_size - len(docs) + 0.5) - math.log(len(docs) + 0.5)
            if idf > self.alpha:
                self.idf[word] = idf
            else:
                del self.t2d[word]

    def scores(self, query_tokens: list[str]) -> dict[int, float]:
        """Score accumulation: bm25_functions.py:166-172.

        Note: each query-token *occurrence* contributes (duplicate tokens
        in the query are walked twice, doubling their contribution).
        To keep float summation deterministic and matchable by the
        distributed engine, contributions are summed per-doc in sorted
        (token-occurrence-index) order — same order the engine pins.
        """
        scores: dict[int, float] = defaultdict(float)
        for token in query_tokens:
            if token in self.t2d:
                for index, freq in self.t2d[token].items():
                    denom_cst = self.k1 * (1 - self.b + self.b * self.doc_len[index] / self.avgdl)
                    scores[index] += self.idf[token] * freq * (self.k1 + 1) / (freq + denom_cst)
        return scores

    def top_n(self, query_tokens: list[str], n: int) -> list[tuple[int, float]]:
        """heap top-n (bm25_functions.py:174) with the engine's deterministic
        tie-break made explicit: score DESC, doc_id ASC. The reference's heap
        breaks exact ties by dict insertion order (first-touched doc), which
        is order-unstable; ranks can differ from the reference only between
        docs with exactly equal float scores.
        """
        scores = self.scores(query_tokens)
        return heapq.nsmallest(n, scores.items(), key=lambda kv: (-kv[1], kv[0]))


def oracle_search(texts: list[str], query: str, n: int = 10, k1: float = 1.5,
                  b: float = 0.75, alpha: float = -math.inf,
                  clean: bool = False) -> list[tuple[int, float]]:
    """Full reference pipeline: lower (P2) → [clean F1] → tokenize (F3) →
    BM25 → top-n. Query goes through the same lower+tokenize
    (bm25_functions.py:529-540); clean is NOT applied to the query in the
    reference (the query path calls only convert_bm25_query_to_tokens)."""
    prepared = [str(t).lower() for t in texts]          # bm25_functions.py:309
    if clean:
        prepared = [clean_py(t) for t in prepared]      # bm25_functions.py:322-336
    corpus = [tokenize_py(t) for t in prepared]
    bm = OracleBM25(corpus, k1=k1, b=b, alpha=alpha)
    qtokens = tokenize_py(str(query).lower())           # bm25_functions.py:529-540
    return bm.top_n(qtokens, n)


def oracle_search_counts(texts: list[str], counts: dict[str, int],
                         n: int = 10, k1: float = 1.5, b: float = 0.75,
                         alpha: float = -math.inf) -> list[tuple[int, float]]:
    """oracle_search over an explicit (term -> occurrence count) multiset
    — the oracle twin of IndexSearcher._search_counts (expanded queries).
    Occurrences are replayed term-sorted; the engine's count-multiplier
    summation differs from per-occurrence order only by float
    re-association, absorbed by the callers' 1e-9 tolerance."""
    corpus = [tokenize_py(str(t).lower()) for t in texts]
    bm = OracleBM25(corpus, k1=k1, b=b, alpha=alpha)
    qtokens = [t for t in sorted(counts) for _ in range(counts[t])]
    return bm.top_n(qtokens, n)
