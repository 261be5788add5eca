"""Deterministic synthetic corpora at arbitrary scale for growth-curve
evidence (VERDICT r3 task 6).

The driver's testdata stops at sf0.1 (5,000 docs), which gives the
candidate-bounding claims only two points. This generator reproduces
the driver corpus's *statistics* — the same 31-word vocabulary,
10-100 uniform tokens per doc, bounded near-dup clusters (a base doc
plus <= 3 light mutations), 64-dim near-gaussian embeddings with
perturbed-copy clusters — at any document count, so
tests/test_scale_evidence.py can measure candidate growth across a
10x size range generated from ONE recipe (mixing the driver corpus
with a different recipe would confound collision statistics with
recipe drift).

Seeded stdlib/numpy RNG: bit-identical across runs and platforms.
Fixtures are written once under .scale_fixtures/ (gitignored) and
reused.
"""

from __future__ import annotations

import os
import random

# the sf0.1 documents vocabulary, verbatim
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "en", "de", "es", "fr", "zh"]  # en-heavy, like the driver
EMB_DIM = 64
N_LABELS = 10

_FIXTURE_ROOT = os.path.join(os.path.dirname(__file__), "..", ".scale_fixtures")


def _vocab_for(n_docs: int) -> list[str]:
    """Heaps'-law vocabulary: real corpora add distinct terms roughly
    as a power of corpus size, so a scale-varying fixture must too —
    holding the driver's 31-word vocabulary fixed while n grows 10x
    makes every doc share shingles with every other (shingle-set
    Jaccard between UNRELATED docs rises with n), which measures
    vocabulary saturation, not the operators' candidate bounds."""
    extra = int(8 * n_docs ** 0.5)
    return VOCAB + [f"w{k}" for k in range(extra)]


def _gen_docs(n_docs: int, seed: int = 42):
    """(doc_id, text, lang, source, n_chars) rows. Every 25th doc seeds
    a near-dup cluster: up to 3 of the following docs are the base text
    with 1-2 token substitutions (3-shingle Jaccard ~0.85-0.95, the
    same planted-template structure the driver corpus shows). Cluster
    size is BOUNDED — that is the property that makes candidate counts
    linear in n, so the generator must hold it fixed as n grows."""
    rng = random.Random(seed)
    vocab = _vocab_for(n_docs)
    rows = []
    pending: list[list[str]] = []  # mutations still to emit
    for i in range(n_docs):
        if pending:
            toks = pending.pop()
        else:
            n_tok = rng.randint(10, 100)
            toks = [rng.choice(vocab) for _ in range(n_tok)]
            if i % 25 == 0 and n_tok >= 20:
                for _ in range(rng.randint(1, 3)):
                    m = list(toks)
                    for _ in range(rng.randint(1, 2)):
                        m[rng.randrange(len(m))] = rng.choice(vocab)
                    pending.append(m)
        text = " ".join(toks)
        rows.append(
            (i, text, rng.choice(LANGS), f"src{rng.randrange(20)}", len(text))
        )
    return rows


def _gen_embeddings(n_vecs: int, seed: int = 42):
    """(vec_id, embedding, label) rows, 64-dim ~N(0, 0.1) like the
    driver table. Every 25th vector seeds a cluster of up to 3
    perturbed copies (cosine ~0.99) — the planted structure sign-LSH
    blocking must find without all-pairs."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    pending: list = []
    for i in range(n_vecs):
        if pending:
            v = pending.pop()
        else:
            v = rng.normal(0.0, 0.1, EMB_DIM)
            if i % 25 == 0:
                for _ in range(int(rng.randint(1, 4))):
                    pending.append(v + rng.normal(0.0, 0.01, EMB_DIM))
        rows.append((i, [float(x) for x in v], int(rng.randint(0, N_LABELS))))
    return rows


def ensure_fixture(n_docs: int, seed: int = 42) -> str:
    """Materialize documents.parquet + embeddings.parquet for
    ``n_docs`` under .scale_fixtures/n{n_docs}/ (once); return the
    directory — the same layout as a /root/testdata/sf* dir, so
    plans.registry.load works on it unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.abspath(os.path.join(_FIXTURE_ROOT, f"n{n_docs}_s{seed}"))
    docs_p = os.path.join(out, "documents.parquet")
    emb_p = os.path.join(out, "embeddings.parquet")
    if os.path.exists(docs_p) and os.path.exists(emb_p):
        return out
    os.makedirs(out, exist_ok=True)
    d = _gen_docs(n_docs, seed)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in d], pa.int64()),
                "text": pa.array([r[1] for r in d], pa.string()),
                "lang": pa.array([r[2] for r in d], pa.string()),
                "source": pa.array([r[3] for r in d], pa.string()),
                "n_chars": pa.array([r[4] for r in d], pa.int64()),
            }
        ),
        docs_p,
    )
    e = _gen_embeddings(n_docs, seed)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in e], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in e], pa.list_(pa.float64())
                ),
                "label": pa.array([r[2] for r in e], pa.int64()),
            }
        ),
        emb_p,
    )
    return out
