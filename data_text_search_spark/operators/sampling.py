"""Deterministic content-addressed sampling and split assignment.

`rand()`-based sampling is unstable: a rerun, a different partitioning,
or a different cluster size draws a different sample, so eval splits
drift and bug reproductions vanish. Hashing the ROW ID instead gives a
sample that is a pure function of the data: same rows on every run,
every engine, every cluster size — and adding new rows to the corpus
never reshuffles which old rows are sampled (the property eval splits
at 100 TB need).

Mechanism: the first 8 hex chars of md5(id_string || salt), compared
LEXICOGRAPHICALLY against a hex threshold. Lowercase-hex string order
equals numeric order, md5 of a UTF-8 string is engine-portable (Spark,
DuckDB, Python hashlib all agree), so the exact same rows pass on any
engine — the contract row hash-matches a DuckDB twin computing the
identical expression. Salt decorrelates: different salts give
independent samples from the same ids.

Scale shape: pure JVM expressions (md5 + substring + comparison) — no
shuffle, no UDF, fully pushdown-friendly; a sample-then-aggregate plan
keeps whole-stage codegen end to end.

Domain separation: hash_sample and hash_split hash DIFFERENT strings
for the same id (a "sample|"/"split|" prefix on the salt) — without
it, sampling at 50% then splitting 80/10/10 puts every sampled row in
train (both decisions would read the same hash). The prefixes are part
of the spec; the DuckDB oracle uses them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8  # 8 hex chars


def _bucket_expr(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)


def _hex_threshold(fraction: float) -> str:
    """Exclusive upper bound: a row is in iff bucket < threshold, so
    fraction=0 keeps nothing (an inclusive <= '00000000' bound would
    keep the ~2^-32 of rows hashing to exactly zero) and every
    fraction keeps exactly int(frac*16^8)/16^8 of the bucket space."""
    frac = min(max(float(fraction), 0.0), 1.0)
    return format(min(int(frac * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Keep ~`fraction` of rows, chosen by id hash — deterministic
    across runs, engines, and cluster sizes. fraction=1.0 keeps all,
    fraction=0.0 keeps none."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(_bucket_expr(id_col, "sample|" + salt)
                     < F.lit(_hex_threshold(fraction)))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      group_col: str, id_col: str = "doc_id",
                      salt: str = "",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-group content-addressed sampling — the training-mixture
    primitive (keep 10% of English, 100% of a low-resource language,
    drop everything unlisted): each row keeps iff its id hash falls
    under ITS group's threshold. Same md5 mechanism as hash_sample
    under a third 'strata|' domain (decorrelated from both sample| and
    split|), so per-group samples are deterministic, engine-portable,
    stable under corpus growth, and a later hash_split of the result
    stays unbiased. Groups absent from ``fractions`` use
    ``default_fraction`` (0.0 = drop, 1.0 = keep all). Pure JVM CASE
    expression over the hash — no shuffle, no UDF."""
    for k, v in fractions.items():
        if not (0.0 <= float(v) <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not (0.0 <= float(default_fraction) <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1]")
    b = _bucket_expr(id_col, "strata|" + salt)

    def _keep(frac: float) -> Column:
        if frac >= 1.0:
            return F.lit(True)
        if frac <= 0.0:
            return F.lit(False)
        return b < F.lit(_hex_threshold(frac))

    expr = None
    for k, v in fractions.items():
        cond = F.col(group_col) == F.lit(k)
        expr = (F.when(cond, _keep(v)) if expr is None
                else expr.when(cond, _keep(v)))
    expr = (_keep(default_fraction) if expr is None
            else expr.otherwise(_keep(default_fraction)))
    return df.filter(expr)


def hash_split(df: DataFrame, fractions: dict[str, float],
               id_col: str = "doc_id", salt: str = "",
               split_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/val/test
    style) by consecutive hash ranges: fractions are cumulated in
    insertion order and the LAST split absorbs the float-rounding
    remainder, so the assignment is total — every row lands in exactly
    one split, and the same split, everywhere. Fractions must sum to 1
    (a typoed {train: .6, test: .6} would otherwise silently hand test
    40%, not 60%)."""
    if not fractions or not all(v > 0 for v in fractions.values()):
        raise ValueError("fractions must be non-empty and positive")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    cum, bounds = 0.0, []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append(_hex_threshold(cum))
    b = _bucket_expr(id_col, "split|" + salt)
    expr = None
    for name, bound in zip(names[:-1], bounds):
        cond = b < F.lit(bound)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(split_col, expr)
