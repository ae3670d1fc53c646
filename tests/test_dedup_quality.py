"""Quality pins for the near-dup pipeline: LSH candidates must cover the
exact-Jaccard duplicate set (recall), and the verified pipeline must equal
exact pairwise Jaccard filtering (precision by construction)."""

from __future__ import annotations

from cdc_export_system_spark.dedup.jaccard import dedup_ngram_jaccard
from cdc_export_system_spark.dedup.minhash import (
    dedup_minhash_lsh,
    dedup_minhash_verified,
)
from tests.conftest import SF_DIR


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_lsh_recall_covers_exact_duplicates(spark):
    exact = _pairs(dedup_ngram_jaccard(spark, SF_DIR))
    candidates = _pairs(dedup_minhash_lsh(spark, SF_DIR))
    assert exact, "corpus should contain planted near-duplicates"
    missed = exact - candidates
    recall = 1 - len(missed) / len(exact)
    # 16 bands x 2 rows: P(candidate | jaccard 0.5) ~ 0.994 per pair
    assert recall >= 0.9, f"LSH recall {recall:.2f}; missed {sorted(missed)[:5]}"


def test_verified_pipeline_equals_exact_jaccard(spark):
    exact = _pairs(dedup_ngram_jaccard(spark, SF_DIR))
    verified = _pairs(dedup_minhash_verified(spark, SF_DIR))
    # verification filters candidates with the same threshold, so verified
    # pairs are exactly the exact pairs that survived candidate generation
    assert verified <= exact
    assert len(verified) >= 0.9 * len(exact)
