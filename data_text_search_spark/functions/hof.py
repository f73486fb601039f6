"""Higher-order-function expression utilities.

Catalyst's CollapseProject / PushDownPredicate freely inline a projected
alias into every later reference — including into the BODY of a
higher-order-function lambda, where the inlined expression is then
re-evaluated PER ARRAY ELEMENT (HOFs run interpreted, so codegen
subexpression elimination never rescues the copies). The round-5
phrase_search plan re-tokenized the corpus once per window position
inside a pushed-down filter exactly this way; shingles() carried the
same hazard in its window transform. The helpers here make expensive
row-level expressions opaque to those rewrites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def once(col: Column, body) -> Column:
    """Evaluate ``col`` exactly once per row and feed it to ``body`` as a
    lambda-bound variable.

    Binding the value as a higher-order ``transform`` lambda variable
    makes it opaque to alias inlining: the optimizer cannot substitute
    through a lambda binding, so the expression is evaluated once
    however the surrounding plan is rearranged — in particular it is
    never re-evaluated per element of a nested HOF in ``body``."""
    return F.element_at(F.transform(F.array(col), body), 1)


def explode_keep(df: DataFrame, head: list[Column], row: Column,
                 keep) -> DataFrame:
    """Project ``row`` and keep rows where ``keep(row)`` holds, with the
    row expression evaluated exactly once: the filter runs INSIDE a
    generator expression (explode of a 0/1-element array), so
    PushDownPredicate has no predicate-above-project to duplicate. A
    plain .select(...).filter(...) would inline the full row expression
    into the pushed filter copy and evaluate it twice per row. The
    kept value lands in column ``_r``."""
    return df.select(*head,
                     F.explode(F.filter(F.array(row), keep)).alias("_r"))
