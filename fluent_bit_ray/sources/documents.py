"""Synthetic documents table for benchmarks at scales the driver does
not ship (driver testdata carries documents.parquet only up to sf0.1).

Mirrors the driver table's shape (doc_id:int64, text:string,
lang:string, source:string, n_chars:int64) and its word-soup grammar,
with planted exact (~4%) and near (~8%) duplicates so the dedup family
has realistic work. Deterministic (seed-fixed) and cached under
/tmp/graft_docs/v{GEN_VERSION_DOCS} — bump the version on any
generator change (same rule as the transcripts cache).

Used ONLY by bench.py for scaling runs; correctness oracles always use
the driver-provided tables.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION_DOCS = 3

_VOCAB = ("spark line column order small sort fast value scan hash slow "
          "group batch agg filter query big key window row part table "
          "stream merge data a the join vector customer").split()

_LANGS = ["en", "en", "en", "zh", "de", "fr"]


def docs_for_sf(sf: float) -> int:
    return max(50, int(round(sf * 50_000)))


def synth_documents(n: int, seed: int = 17) -> pa.Table:
    rs = np.random.RandomState(seed)
    texts: list[str] = []
    for i in range(n):
        r = rs.randint(0, 100)
        if i > 10 and r < 4:       # exact duplicate of an earlier doc
            texts.append(texts[rs.randint(0, i)])
            continue
        if i > 10 and r < 12:      # near duplicate: 1-2 word edits
            words = texts[rs.randint(0, i)].split()
            for _ in range(1 + rs.randint(0, 2)):
                words[rs.randint(0, len(words))] = \
                    _VOCAB[rs.randint(0, len(_VOCAB))]
            texts.append(" ".join(words))
            continue
        ln = 12 + int(rs.randint(0, 60))
        texts.append(" ".join(_VOCAB[j] for j in
                              rs.randint(0, len(_VOCAB), ln)))
    return pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([_LANGS[int(x)] for x in
                          rs.randint(0, len(_LANGS), n)]),
        "source": pa.array([f"src{int(x)}" for x in rs.randint(0, 10, n)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


def ensure_documents(sf: float) -> str:
    """Synthesize-and-cache; returns a parquet DIRECTORY path.

    The table is written as MANY files (one read task each): a single
    small file reads as ONE Ray task — measured: the whole simhash
    stage ran at ~6× on 16 CPUs because every map task queued behind
    the serial read. Multi-file is also the only realistic layout for
    the 100 TB target, where input arrives as thousands of shards.
    """
    d = f"/tmp/graft_docs/v{GEN_VERSION_DOCS}/sf{sf:g}"
    path = os.path.join(d, "documents")
    if not os.path.exists(path):
        tab = synth_documents(docs_for_sf(sf))
        shards = max(1, min(64, tab.num_rows // 6_000))
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        step = -(-tab.num_rows // shards)
        for i in range(shards):
            part = tab.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, os.path.join(tmp, f"part-{i:05d}.parquet"),
                               row_group_size=2048)
        os.replace(tmp, path)
    return path
