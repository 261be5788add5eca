"""Supplementary scale-robustness variants.

Registered LAST (after the relational vocabulary) on purpose: the
first 50 registration slots are reserved for SURVEY.md §2 operators +
the LLM-pipeline family plus the relational classics (see
plans/__init__.py). Everything here is still covered by the repo's own
oracle-differential pytest; these queries exist to demonstrate the
scale-hardened variant of an already-green operator, not to claim new
operator surface.
"""

from __future__ import annotations

from ..operators.dedup import lsh_candidate_pairs_salted, minhash_signatures
from .dedup_queries import BANDS, NUM_HASHES, ROWS_PER_BAND, candidates_cte
from .registry import load, register


@register(
    "dedup_minhash_lsh_salted",
    f"WITH {candidates_cte('documents')} SELECT id_a, id_b FROM cand",
)
def q_dedup_minhash_lsh_salted(spark, sf_dir):
    """Skew-bounded twin of ``dedup_minhash_lsh`` — IDENTICAL output
    (same DuckDB oracle), different pair-generation physics: each
    (band, bucket) id list is sliced into salt=4 chunks and the 10
    chunk-pairs are repartitioned so an adversarial duplicate cluster
    of k docs spreads its k^2/2 candidate pairs over ~salt^2/2 tasks
    instead of stalling one (operators/dedup.py:
    lsh_candidate_pairs_salted). This is the variant you run at 100 TB
    when duplicate-group sizes are unknown."""
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", NUM_HASHES, 3)
    return lsh_candidate_pairs_salted(sigs, "doc_id", BANDS, ROWS_PER_BAND, salt=4)
