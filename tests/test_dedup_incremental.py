"""Incremental MinHash probe (dedup_incremental_new_docs): the incoming
batch's collision verdicts must agree exactly with the full pairwise LSH
query restricted to mixed (incoming, index) pairs — same signatures, same
band buckets, so the incremental path may never invent or miss a match."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_incremental_probe_agrees_with_pairwise_lsh(spark):
    from edgy_spark.operators.dedup import (
        INC_MOD,
        dedup_incremental_new_docs,
        dedup_minhash_lsh_pairs,
    )

    probe = {
        r.doc_id: (r.n_index_matches, r.kept)
        for r in dedup_incremental_new_docs(spark, SF_SMOKE).collect()
    }
    assert probe, "no incoming docs at smoke scale"

    pairs = dedup_minhash_lsh_pairs(spark, SF_SMOKE).collect()
    mixed: dict[int, set[int]] = {}
    for r in pairs:
        for new, old in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if new % INC_MOD == 0 and old % INC_MOD != 0:
                mixed.setdefault(new, set()).add(old)

    # every incoming doc's match count equals its mixed-pair fan-out, and
    # kept is exactly "no mixed pair"
    for doc_id, (n_matches, kept) in probe.items():
        assert n_matches == len(mixed.get(doc_id, set())), doc_id
        assert kept == (doc_id not in mixed), doc_id
    # and no mixed pair references a doc the probe missed
    assert set(mixed) <= set(probe)
