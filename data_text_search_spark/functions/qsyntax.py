"""Lucene classic query-string syntax — the shared parse used by BOTH
the engine (IndexSearcher.query_string) and the DuckDB oracle replay
(oracle_sql.query_string_sql), so the two sides can never drift.

Supported subset (Lucene QueryParser's everyday core):
    +term      required (must) — also scores, as in Lucene
    -term      forbidden (must_not) — never scores
    term       optional (should) — scores
    "a b c"    exact phrase, required; -"a b c" forbidden
A bare word that the engine tokenizer splits (e.g. ``state-of-the-art``)
becomes one clause per token under the same sign; a quoted string that
tokenizes to a single token degrades to a term clause (Lucene does the
same). No field prefixes, boosts, ranges, or grouping parentheses —
those are fielded_search / boolean_search territory.

Scoring divergence (documented): Lucene scores a phrase clause with
positional statistics; this engine's index is positionless, so a
required phrase gates membership exactly (verbatim window match) while
its tokens enter the BM25 scorer as ordinary term counts.
"""

from __future__ import annotations

import re
from collections import Counter

from data_text_search_spark.functions.text import tokenize_py

_CLAUSE = re.compile(r'([+-])?("([^"]*)"|\S+)')


def parse_query_string(qs: str) -> list[tuple[str, str, list[str]]]:
    """Parse into clauses ``(sign, kind, tokens)`` with sign in
    {'', '+', '-'} and kind in {'term', 'phrase'}; term clauses carry
    exactly one token. Empty-tokenizing clauses (punctuation-only) are
    dropped, like Lucene's analyzer does."""
    clauses: list[tuple[str, str, list[str]]] = []
    for m in _CLAUSE.finditer(qs):
        sign = m.group(1) or ""
        quoted = m.group(3) is not None
        toks = tokenize_py(m.group(3) if quoted else m.group(2))
        if not toks:
            continue
        if quoted and len(toks) > 1:
            clauses.append((sign, "phrase", toks))
        else:
            for t in toks:
                clauses.append((sign, "term", [t]))
    return clauses


def compile_query_string(qs: str) -> tuple[
        Counter, list[str], list[str], list[list[str]], list[list[str]]]:
    """Reduce the clause list to execution inputs:
    (scoring term counts, must terms, must_not terms, must phrases,
    must_not phrases). Positive terms — should AND must, plus required
    phrases' tokens — accumulate scoring counts; negated clauses never
    score."""
    counts: Counter = Counter()
    must: list[str] = []
    must_not: list[str] = []
    phrases: list[list[str]] = []
    not_phrases: list[list[str]] = []
    for sign, kind, toks in parse_query_string(qs):
        if kind == "term":
            t = toks[0]
            if sign == "-":
                must_not.append(t)
            else:
                counts[t] += 1
                if sign == "+":
                    must.append(t)
        else:
            if sign == "-":
                not_phrases.append(toks)
            else:
                counts.update(toks)
                phrases.append(toks)
    return counts, sorted(set(must)), sorted(set(must_not)), \
        phrases, not_phrases
