"""Lucene classic query-string syntax — the shared parse used by BOTH
the engine (IndexSearcher.query_string) and the DuckDB oracle replay
(oracle_sql.query_string_sql), so the two sides can never drift.

Supported subset (Lucene QueryParser's everyday core):
    +term      required (must) — also scores, as in Lucene
    -term      forbidden (must_not) — never scores
    term       optional (should) — scores
    "a b c"    exact phrase, required; -"a b c" forbidden.
               Documented divergence: a ~N suffix on a MULTI-token
               quoted clause (Lucene's phrase slop, ``"a b"~2``) is
               parsed and IGNORED — the clause gates as an EXACT
               phrase, which is strictly narrower than Lucene's slop
               match. Both the engine and the DuckDB oracle share this
               parse, so the two sides agree; proximity queries are
               positions.span_near / span_window territory.
    term^2.5   boost: the clause's scoring weight is multiplied by the
               (non-negative) number — Lucene's ^ boost. Works on
               quoted phrases too ("a b"^3 boosts every phrase token);
               boosts on -clauses are parsed and ignored (a must_not
               clause never scores, exactly Lucene).
    term~N     fuzzy clause (Lucene FuzzyQuery in the classic syntax):
               expands against the TERM DICTIONARY to every term
               within N edits (bare ``~`` = 2, Lucene's default); each
               expansion scores with the clause's boost as its count.
               Documented divergence: Lucene rewrites a fuzzy clause
               as a blended-idf disjunction; here every expansion is
               an ordinary weighted term (same rewrite rule as
               search_synonyms). +/- signs gate membership on ANY
               expansion matching.
    pre*       trailing-star prefix clause (PrefixQuery): expands to
               every dictionary term starting with ``pre``, same
               scoring/sign rules as fuzzy. Stars anywhere else in a
               word are tokenizer punctuation, not wildcards
               (general mid-word wildcards are wildcard_search
               territory).
A bare word that the engine tokenizer splits (e.g. ``state-of-the-art``)
becomes one clause per token under the same sign (and boost) — a ~ or
* suffix on such a word is ignored (fuzzy/prefix apply to single
terms, as in Lucene); a quoted string that tokenizes to a single token
degrades to a term clause (Lucene does the same). No field prefixes,
ranges, or grouping parentheses — those are fielded_search /
boolean_search territory.

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
    r'([+-])?(?:"([^"]*)"|([^\s"]+?))(\*)?(?:~(\d*))?'
    r'(?:\^(\d+(?:\.\d+)?))?(?=\s|$)')


def parse_query_string(qs: str) -> list[tuple[str, str, list[str], float]]:
    """Parse into clauses ``(sign, kind, tokens, boost)`` with sign in
    {'', '+', '-'}, kind in {'term', 'phrase', 'prefix', 'fuzzy:<n>'},
    boost a non-negative float (1.0 when absent); term/prefix/fuzzy
    clauses carry exactly one token. The regex backtracks so only a
    TRAILING * or ~N is syntax (``mid*dle`` / ``a~b`` stay one bare
    word for the tokenizer); a suffix on a word the tokenizer splits
    is dropped and the parts become plain term clauses. Empty-
    tokenizing clauses (punctuation-only) are dropped, like Lucene's
    analyzer does."""
    clauses: list[tuple[str, str, list[str], float]] = []
    for m in _CLAUSE.finditer(qs):
        sign = m.group(1) or ""
        quoted = m.group(2) is not None
        star = m.group(4) is not None
        fuzz = m.group(5)
        boost = float(m.group(6)) if m.group(6) is not None else 1.0
        toks = tokenize_py(m.group(2) if quoted else m.group(3))
        if not toks:
            continue
        if quoted and len(toks) > 1:
            clauses.append((sign, "phrase", toks, boost))
        elif not quoted and len(toks) == 1 and star:
            clauses.append((sign, "prefix", toks, boost))
        elif not quoted and len(toks) == 1 and fuzz is not None:
            n = int(fuzz) if fuzz else 2
            clauses.append((sign, f"fuzzy:{n}", toks, boost))
        else:
            for t in toks:
                clauses.append((sign, "term", [t], boost))
    return clauses


def compile_query_string(qs: str) -> tuple[
        Counter, list[str], list[str], list[list[str]], list[list[str]],
        list[tuple[str, str, str, int | None, float]]]:
    """Reduce the clause list to execution inputs:
    (scoring term counts, must terms, must_not terms, must phrases,
    must_not phrases, expansion clauses). Positive terms — should AND
    must, plus required phrases' tokens — accumulate scoring counts
    WEIGHTED BY their clause boost (^ suffix; 1.0 when absent —
    unboosted queries compile to the exact integer counts they always
    did); negated clauses never score, so their boosts are ignored.

    Expansion clauses (prefix / fuzzy) come back UNEXPANDED as
    (sign, kind, token, max_edits-or-None, boost): the parse cannot
    see a dictionary. The engine expands against its term dictionary
    and merges (every expansion scores `boost` like a should term;
    '+' gates on ANY expansion matching, '-' on none); the DuckDB
    replay derives the SAME expansion with SQL over the corpus
    vocabulary — one parse, two independent expansions, so a wrong
    dictionary lookup cannot hide."""
    counts: Counter = Counter()
    must: list[str] = []
    must_not: list[str] = []
    phrases: list[list[str]] = []
    not_phrases: list[list[str]] = []
    expansions: list[tuple[str, str, str, int | None, float]] = []
    for sign, kind, toks, boost in parse_query_string(qs):
        if kind == "term":
            t = toks[0]
            if sign == "-":
                must_not.append(t)
            else:
                counts[t] += boost if boost != 1.0 else 1
                if sign == "+":
                    must.append(t)
        elif kind == "prefix":
            expansions.append((sign, "prefix", toks[0], None, boost))
        elif kind.startswith("fuzzy:"):
            expansions.append((sign, "fuzzy", toks[0],
                               int(kind.split(":", 1)[1]), boost))
        else:
            if sign == "-":
                not_phrases.append(toks)
            else:
                for t in toks:
                    counts[t] += boost if boost != 1.0 else 1
                phrases.append(toks)
    return counts, sorted(set(must)), sorted(set(must_not)), \
        phrases, not_phrases, expansions
