#!/usr/bin/env python
"""Measurement-only scale-up of the driver testdata (guide §1: measure
at the driver's scale). The driver's round-end bench ran at sf1.0
(BENCH_r05.json: documents 10x sf0.1); its generated dir is not kept in
the sandbox, so this script builds a deterministic stand-in at
/tmp/sf1.0 for THIS round's before/after measurements:

- documents: each sf0.1 doc appears 10x; copy k keeps the text's token
  multiset and almost all n-grams (tokens cyclically ROTATED by k*7),
  so tf/df distributions scale like a denser organic corpus (df ~10x,
  shared-shingle pair mass ~100x sf0.1 — the same scaling the driver's
  own sf1.0 showed) without creating exact duplicates.
- embeddings: 10 noisy copies per vector (relative noise 5e-3, seeded),
  keeping near-dup group structure (~45 pairs/group at cos >= 0.4+).
- events: 10 shifted copies.

NEVER used by bench.py, the oracle, or any query path — numbers from
this dir are for relative before/after comparison only; the frozen
bench.py runs against it solely because $SPARK_GRAFT_SF_DIR points
here during measurement.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
COPIES = 10


def rotate(text: str, k: int) -> str:
    if k == 0 or not text:
        return text
    toks = text.split(" ")
    r = (k * 7) % max(len(toks), 1)
    return " ".join(toks[r:] + toks[:r])


def main() -> None:
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    pdf = docs.to_pandas()
    frames = []
    for k in range(COPIES):
        c = pdf.copy()
        c["doc_id"] = c["doc_id"] + k * 1_000_000
        if k:
            c["text"] = [rotate(t, k) for t in c["text"]]
            c["n_chars"] = [len(t) for t in c["text"]]
        frames.append(c)
    import pandas as pd
    out = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                   f"{DST}/documents.parquet")
    print("documents", len(out))

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    rs = np.random.RandomState(20260821)
    eframes = []
    for k in range(COPIES):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * 1_000_000
        if k:
            vecs = np.array(c["embedding"].tolist(), dtype=np.float64)
            noise = rs.standard_normal(vecs.shape)
            vecs = vecs + noise * 5e-3 * np.abs(vecs).mean()
            c["embedding"] = [list(map(float, v)) for v in vecs]
        eframes.append(c)
    eout = pd.concat(eframes, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(eout, preserve_index=False),
                   f"{DST}/embeddings.parquet")
    print("embeddings", len(eout))

    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    vframes = []
    for k in range(COPIES):
        c = ev.copy()
        c["event_id"] = c["event_id"] + k * 10_000_000
        c["user_id"] = c["user_id"] + k * 1_000_000
        vframes.append(c)
    vout = pd.concat(vframes, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(vout, preserve_index=False),
                   f"{DST}/events.parquet")
    print("events", len(vout))


if __name__ == "__main__":
    main()
