"""Frozen-vocab tokenizer scale + contract tests (review r13 task #2).

The r13 tokenizer chained one ``F.aggregate`` lambda PER merge, so plan
depth — and Catalyst analysis cost — grew with vocab size (the r09
lesson: ~2.4s planning for a 16-step literal fold; a 32k-merge
production vocab would not plan).  ``fold_merges_expr`` replaces the
chain with ONE fold over a flat merge-table literal; these tests pin
(a) semantic equivalence with the textbook greedy re-scan at a vocab
size the old formulation could not plan, (b) bounded wall-clock for the
1,000-merge plan+execute, and (c) the NULL-text ↔ wordless-document
equivalence the oracle's COALESCE expects (r13 ADVICE).
"""

from __future__ import annotations

import time
from collections import namedtuple

from pyspark.sql import functions as F

Merge = namedtuple("Merge", ["merge_rank", "left_sym", "right_sym"])


def _chain_merges(n: int) -> list[Merge]:
    # merge 1 = (a,b) → "ab", merge 2 = ("ab","c") → "abc", … — every
    # merge's left side is the previous surface, so folding the word
    # "abcdefghij…" exercises a real match at every rank while the table
    # stays 1 surface per rank (ranks past the word length never match)
    merges, surface = [], "a"
    for r in range(1, n + 1):
        nxt = chr(97 + r % 26)
        merges.append(Merge(r, surface, nxt))
        surface = surface + nxt
    return merges


def test_fold_merges_1000_vocab_plans_and_runs_bounded(spark):
    from edgy_spark.operators.text import fold_merges_expr

    merges = _chain_merges(1000)
    df = spark.createDataFrame(
        [("abcdefghij",), ("zzz",), ("a",)], "word string"
    )
    t0 = time.monotonic()
    out = df.select(
        fold_merges_expr(F.split("word", ""), merges).alias("syms")
    ).collect()
    elapsed = time.monotonic() - t0
    got = {tuple(r.syms) for r in out}
    # "abcdefghij" folds through ranks 1..9 into the single surface
    # (rank 10's left side is 11 chars — longer than the word — and every
    # later rank's left side only grows, so exactly 9 merges apply)
    assert ("abcdefghij",) in got
    assert ("z", "z", "z") in got
    assert ("a",) in got
    # the old per-merge chain measured ~2.4s of planning for 16 steps;
    # 1000 steps would be minutes-to-hang.  Constant depth: generous CI
    # bound, orders of magnitude under the chained formulation.
    assert elapsed < 60, f"1000-merge fold took {elapsed:.1f}s"


def test_fold_merges_matches_naive_rescan(spark):
    # property: the one-expression fold == the textbook per-merge greedy
    # leftmost re-scan, on inputs with overlapping/self-matching pairs
    from edgy_spark.operators.text import fold_merges_expr

    merges = [Merge(1, "a", "a"), Merge(2, "aa", "b"), Merge(3, "b", "a")]
    words = ["aaaa", "aaab", "baba", "aabab", "abbaab", "bbbb", "a", ""]

    def naive(word: str) -> list[str]:
        syms = list(word)
        for _, a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    df = spark.createDataFrame([(w,) for w in words if w], "word string")
    got = {
        r.word: list(r.syms)
        for r in df.select(
            "word", fold_merges_expr(F.split("word", ""), merges).alias("syms")
        ).collect()
    }
    for w in words:
        if w:
            assert got[w] == naive(w), w


def test_null_text_tokenizes_like_wordless_text(spark, tmp_path):
    # r13 ADVICE: a NULL documents.text must follow the documented
    # empty-sequence contract — (0, NULL, NULL, 0) — exactly as the
    # oracle's COALESCE produces, not propagate NULL through the fold.
    # Whitespace-only text is the other empty-sequence case.
    from edgy_spark.operators.text import text_tokenize_ids

    docs_schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "abab abab baba"), (2, None), (3, " \t\n ")], docs_schema
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in text_tokenize_ids(spark, str(tmp_path)).collect()}
    for doc_id in (2, 3):
        r = rows[doc_id]
        assert (r.n_tokens, r.first_id, r.last_id, r.id_checksum) == (
            0,
            None,
            None,
            0,
        ), doc_id
    assert rows[1].n_tokens > 0


def test_byte_level_alphabet_keeps_punct_digits_nonlatin(spark, tmp_path):
    # r14 (r13 verdict missing-list #2): the pre-r14 `[a-z]+` alphabet
    # silently dropped digits, punctuation, and every non-Latin script.
    # Byte-level symbols (UTF-8 hex pairs) must tokenize ALL of them to
    # non-empty streams, with ids in the byte range (b+1, 1..256) or the
    # merged range (257+).
    from edgy_spark.operators.text import (
        bpe_token_ids,
        text_bpe_encode_lengths,
    )

    docs_schema = "doc_id long, text string"
    texts = {1: "?? 12 --", 2: "héj héj", 3: "日本語 テスト", 4: "mixed π≈3.14"}
    spark.createDataFrame(
        sorted(texts.items()), docs_schema
    ).write.parquet(str(tmp_path / "documents.parquet"))

    ids = {
        r.doc_id: list(r.token_ids)
        for r in bpe_token_ids(spark, str(tmp_path)).collect()
    }
    for doc_id, text in texts.items():
        assert len(ids[doc_id]) > 0, text
        assert all(1 <= i for i in ids[doc_id]), text
    # an unmerged single-byte token id is its byte value + 1
    assert ids[1][0] == ord("?") + 1

    lens = {
        r.doc_id: r
        for r in text_bpe_encode_lengths(spark, str(tmp_path)).collect()
    }
    for doc_id, text in texts.items():
        expect_bytes = sum(len(w.encode()) for w in text.split())
        assert lens[doc_id].n_bytes == expect_bytes, text
        assert 0 < lens[doc_id].n_bpe_tokens <= expect_bytes, text


def test_trained_merges_memoized_per_app_and_sfdir(spark, tmp_path):
    # four catalog queries share the frozen vocab; the trainer's driver
    # rounds must run once per (application, sf_dir) (r13: 32.3s cold
    # bench pass was mostly re-training)
    from edgy_spark.operators import text as text_mod

    spark.createDataFrame(
        [(1, "banana banana band")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    calls = 0
    orig = text_mod.text_bpe_train_merges

    def counting(spark_, sf_dir_):
        nonlocal calls
        calls += 1
        return orig(spark_, sf_dir_)

    text_mod.text_bpe_train_merges = counting
    try:
        a = text_mod.trained_merges(spark, str(tmp_path))
        b = text_mod.trained_merges(spark, str(tmp_path))
    finally:
        text_mod.text_bpe_train_merges = orig
    assert calls == 1
    assert a is b and len(a) >= 1
