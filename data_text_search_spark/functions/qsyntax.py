"""Lucene classic query-string syntax — the shared parse used by BOTH
the engine (IndexSearcher.query_string) and the DuckDB oracle replay
(oracle_sql.query_string_sql), so the two sides can never drift.

Supported subset (Lucene QueryParser's everyday core):
    +term      required (must) — also scores, as in Lucene
    -term      forbidden (must_not) — never scores
    term       optional (should) — scores
    "a b c"    exact phrase, required; -"a b c" forbidden
    term^2.5   boost: the clause's scoring weight is multiplied by the
               (non-negative) number — Lucene's ^ boost. Works on
               quoted phrases too ("a b"^3 boosts every phrase token);
               boosts on -clauses are parsed and ignored (a must_not
               clause never scores, exactly Lucene).
A bare word that the engine tokenizer splits (e.g. ``state-of-the-art``)
becomes one clause per token under the same sign (and boost); a quoted
string that tokenizes to a single token degrades to a term clause
(Lucene does the same). No field prefixes, ranges, or grouping
parentheses — those are fielded_search / boolean_search territory.

Scoring divergence (documented): Lucene scores a phrase clause with
positional statistics; this engine's index is positionless, so a
required phrase gates membership exactly (verbatim window match) while
its tokens enter the BM25 scorer as ordinary term counts.
"""

from __future__ import annotations

import re
from collections import Counter

from data_text_search_spark.functions.text import tokenize_py

_CLAUSE = re.compile(
    r'([+-])?(?:"([^"]*)"|([^\s"]+?))(?:\^(\d+(?:\.\d+)?))?(?=\s|$)')


def parse_query_string(qs: str) -> list[tuple[str, str, list[str], float]]:
    """Parse into clauses ``(sign, kind, tokens, boost)`` with sign in
    {'', '+', '-'}, kind in {'term', 'phrase'}, boost a non-negative
    float (1.0 when absent); term clauses carry exactly one token.
    Empty-tokenizing clauses (punctuation-only) are dropped, like
    Lucene's analyzer does."""
    clauses: list[tuple[str, str, list[str], float]] = []
    for m in _CLAUSE.finditer(qs):
        sign = m.group(1) or ""
        quoted = m.group(2) is not None
        boost = float(m.group(4)) if m.group(4) is not None else 1.0
        toks = tokenize_py(m.group(2) if quoted else m.group(3))
        if not toks:
            continue
        if quoted and len(toks) > 1:
            clauses.append((sign, "phrase", toks, boost))
        else:
            for t in toks:
                clauses.append((sign, "term", [t], boost))
    return clauses


def compile_query_string(qs: str) -> tuple[
        Counter, list[str], list[str], list[list[str]], list[list[str]]]:
    """Reduce the clause list to execution inputs:
    (scoring term counts, must terms, must_not terms, must phrases,
    must_not phrases). Positive terms — should AND must, plus required
    phrases' tokens — accumulate scoring counts WEIGHTED BY their
    clause boost (^ suffix; 1.0 when absent — unboosted queries
    compile to the exact integer counts they always did); negated
    clauses never score, so their boosts are ignored."""
    counts: Counter = Counter()
    must: list[str] = []
    must_not: list[str] = []
    phrases: list[list[str]] = []
    not_phrases: list[list[str]] = []
    for sign, kind, toks, boost in parse_query_string(qs):
        if kind == "term":
            t = toks[0]
            if sign == "-":
                must_not.append(t)
            else:
                counts[t] += boost if boost != 1.0 else 1
                if sign == "+":
                    must.append(t)
        else:
            if sign == "-":
                not_phrases.append(toks)
            else:
                for t in toks:
                    counts[t] += boost if boost != 1.0 else 1
                phrases.append(toks)
    return counts, sorted(set(must)), sorted(set(must_not)), \
        phrases, not_phrases
