"""Property-based pins (hypothesis) for the semantics the engine's
correctness story leans on:

- bag algebra: ``exceptAll`` must implement Haskell ``Data.List.(\\)``'s
  one-occurrence-per-right-element multiset difference (SURVEY §7.4 trap 1 —
  the reference's ``missingTools`` depends on it, app/Main.hs:157);
- union is bag-additive, anti-join removes every occurrence (the documented
  delta between ``minus_bag`` and ``anti`` in edgy_spark.query);
- the exact-DECIMAL aggregation convention is partitioning-invariant: the
  same sum, bit-for-bit, no matter how rows are distributed — the property
  that lets a 1000-executor reduction hash-match a single-threaded oracle.
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from edgy_spark.functions.exact import dec, to_dbl
import pytest

bag = st.lists(st.integers(min_value=0, max_value=5), max_size=12)

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bag_df(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "id long") if xs else \
        spark.createDataFrame([], "id long")


def _counts(df) -> Counter:
    return Counter(r.id for r in df.collect())


@PROP
@given(a=bag, b=bag)
def test_except_all_is_haskell_bag_difference(spark, a, b):
    got = _counts(_bag_df(spark, a).exceptAll(_bag_df(spark, b)))
    ca, cb = Counter(a), Counter(b)
    want = Counter({v: ca[v] - cb[v] for v in ca if ca[v] - cb[v] > 0})
    assert got == want


@PROP
@given(a=bag, b=bag)
def test_union_all_is_bag_additive(spark, a, b):
    got = _counts(_bag_df(spark, a).unionAll(_bag_df(spark, b)))
    assert got == Counter(a) + Counter(b)


@PROP
@given(a=bag, b=bag)
def test_anti_join_removes_all_occurrences(spark, a, b):
    got = _counts(
        _bag_df(spark, a).join(_bag_df(spark, b), "id", "left_anti")
    )
    want = Counter({v: c for v, c in Counter(a).items() if v not in set(b)})
    assert got == want


cents = st.lists(
    st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=40
)


@PROP
@given(xs=cents, nparts=st.integers(min_value=1, max_value=7))
def test_decimal_sum_is_partitioning_invariant(spark, xs, nparts):
    """SUM over exact DECIMAL equals the true rational sum for ANY partition
    layout — double summation would drift with reduction order instead."""
    vals = [x / 100 for x in xs]  # 2-decimal doubles, the money-column shape
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(nparts)
    got = df.agg(to_dbl(F.sum(dec("v", 2)), 2).alias("s")).collect()[0].s
    want = float(sum(Decimal(x) for x in xs) / 100)
    assert got == want


# -- storage model property -------------------------------------------------

# small op vocabulary: each element is (kind, payload)
_store_ops = st.lists(
    st.one_of(
        st.tuples(st.just("txn_add"), st.integers(0, 99)),         # new node via Engine
        st.tuples(st.just("bulk_append"), st.integers(0, 99)),     # writer append
        st.tuples(st.just("maintain"), st.just(0)),                # compact+vacuum
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_store_ops)
def test_store_matches_model_under_random_interleavings(spark, tmp_path_factory, ops):
    """Random interleavings of Engine transactions, data-source bulk
    appends, and maintenance must always read back exactly the model's
    name multiset, and the id counter never collides."""
    from edgy_spark.demo import demo_schema
    from edgy_spark.graph import Engine
    from edgy_spark.sources.pysource import register_edgy_source

    register_edgy_source(spark)
    root = str(tmp_path_factory.mktemp("prop") / "db")
    engine = Engine(spark, root, demo_schema())
    model: list[str] = []
    for i, (kind, v) in enumerate(ops):
        if kind == "txn_add":
            name = f"T{i}_{v}"
            engine.run(lambda t, name=name, v=v: t.new_node("Person", name=name, age=v))
            model.append(name)
        elif kind == "bulk_append":
            name = f"B{i}_{v}"
            # the writer enforces ids >= the store's id cursor (collision +
            # CDC-slice invariant), so a well-behaved bulk loader reads the
            # cursor first — as this one does
            bulk_id = engine.store.snapshot().manifest["next_id"]
            (
                spark.createDataFrame(
                    [(bulk_id, name, v)], "id long, name string, age long"
                )
                .write.format("edgy")
                .option("root", root)
                .option("table", "n_Person")
                .mode("append")
                .save()
            )
            model.append(name)
        else:
            engine.store.compact(min_files=4)
            engine.store.vacuum(retain_versions=2)
    got = sorted(r["name"] for r in engine.snapshot().nodes("Person").collect())
    assert got == sorted(model)
    ids = [r["id"] for r in engine.snapshot().nodes("Person").collect()]
    assert len(ids) == len(set(ids)), "id collision"


def test_spread_is_noop_when_scan_is_wide(spark):
    """_spread must NOT shuffle a scan that is already at least as parallel
    as the session — at 100 TB an unconditional repartition would move the
    entire text payload once before any work."""
    from edgy_spark.operators.dedup import _spread

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = spark.range(1000).repartition(target + 4)
    assert _spread(spark, wide) is wide  # identical object: no-op
    narrow = spark.range(1000).coalesce(1)
    assert _spread(spark, narrow).rdd.getNumPartitions() == target


def test_jaccard_df_cap_drops_stop_shingles_both_ways(spark, tmp_path, monkeypatch):
    """The JACC_MAX_DF cap must cut BOTH ways: suppress pairs whose only
    evidence is boilerplate (stop-shingles), and rescue true near-dups whose
    uncapped score is diluted by stop-shingle denominators.  Corpus (cap=2):

      e1 'a b c d e s s s' / e2 'a b c d e x x x' — identical on the rare
        shingles {abc,bcd,cde}; their tails are boilerplate made ubiquitous
        by the filler docs.  Uncapped J = 3/9 < 0.5 (absent); capped kept
        sets are exactly {abc,bcd,cde} → J = 1.0 (present).
      f1=f2 'd e s s s' and g1=g2 'd e x x x' — pure boilerplate; uncapped
        J(f1,f2)=1 and J(e1,f*)=0.5 would all emit, capped their kept sets
        are empty → no pair.
    """
    from edgy_spark.operators import dedup

    docs = [
        (1, "a b c d e s s s"),
        (2, "a b c d e x x x"),
        (3, "d e s s s"),
        (4, "d e s s s"),
        (5, "d e x x x"),
        (6, "d e x x x"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    monkeypatch.setattr(dedup, "JACC_MAX_DF", 2)
    rows = dedup.dedup_ngram_jaccard_pairs(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


# -- edge-log ordering model ------------------------------------------------

# ops over a 4-node pool; bulk batches are lists of (src, dst) index pairs
_n = st.integers(0, 3)
_edge_ops = st.lists(
    st.one_of(
        st.tuples(st.just("add"), _n, _n),
        st.tuples(st.just("remove"), _n, _n),
        st.tuples(st.just("clear"), _n, st.just(0)),
        st.tuples(st.just("set"), _n, st.lists(_n, max_size=3)),
        st.tuples(
            st.just("bulk"), st.lists(st.tuples(_n, _n), min_size=1, max_size=4),
            st.just(0),
        ),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_edge_ops)
@pytest.mark.slow  # r15: ~45-50s wall; see pyproject addopts
def test_edge_log_matches_list_model(spark, tmp_path_factory, ops):
    """Model-based pin of the reference's adjacency-list semantics under
    ARBITRARY interleavings of point and bulk edge ops in one transaction:
    prepend order, remove-all-copies, clear, set-replace, and bulk blocks
    (dst-ascending per src / src-ascending per dst) — the in-transaction
    read (read-your-writes) AND the committed state must both equal a pure
    Python list model, in both edge directions."""
    from edgy_spark.demo import demo_schema
    from edgy_spark.graph import Engine

    root = str(tmp_path_factory.mktemp("edgeprop") / "db")
    engine = Engine(spark, root, demo_schema())
    p = engine.run(
        lambda t: [t.new_node("Person", name=f"M{i}", age=i) for i in range(4)]
    )
    ids = [n.id for n in p]

    fwd: dict[int, list[int]] = {}
    inv: dict[int, list[int]] = {}

    def _purge_src(s):
        for d in list(inv):
            inv[d] = [x for x in inv[d] if x != s]

    def apply_model(kind, a, b):
        if kind == "add":
            s, d = ids[a], ids[b]
            fwd.setdefault(s, []).insert(0, d)
            inv.setdefault(d, []).insert(0, s)
        elif kind == "remove":
            s, d = ids[a], ids[b]
            fwd[s] = [x for x in fwd.get(s, []) if x != d]
            inv[d] = [x for x in inv.get(d, []) if x != s]
        elif kind == "clear":
            s = ids[a]
            fwd[s] = []
            _purge_src(s)
        elif kind == "set":
            s = ids[a]
            dsts = [ids[i] for i in b]
            _purge_src(s)
            fwd[s] = list(dsts)
            for d in dsts:
                inv.setdefault(d, []).insert(0, s)
        else:  # bulk
            rows = [(ids[s], ids[d]) for s, d in a]
            by_s: dict[int, list[int]] = {}
            by_d: dict[int, list[int]] = {}
            for s, d in rows:
                by_s.setdefault(s, []).append(d)
                by_d.setdefault(d, []).append(s)
            for s, ds in by_s.items():
                fwd[s] = sorted(ds) + fwd.get(s, [])
            for d, ss in by_d.items():
                inv[d] = sorted(ss) + inv.get(d, [])

    in_txn: dict = {}

    def txn(t):
        for kind, a, b in ops:
            if kind == "add":
                t.add_related(p[a], "friend", p[b])
            elif kind == "remove":
                t.remove_related(p[a], "friend", p[b])
            elif kind == "clear":
                t.clear_related(p[a], "friend")
            elif kind == "set":
                t.set_related(p[a], "friend", [p[i] for i in b])
            else:
                t.bulk_add_edges(
                    "friend",
                    spark.createDataFrame(
                        [(ids[s], ids[d]) for s, d in a], "src long, dst long"
                    ),
                )
            apply_model(kind, a, b)
        for i in range(4):
            in_txn[("fwd", i)] = [x.id for x in t.get_related(p[i], "friend")]
            in_txn[("inv", i)] = [x.id for x in t.get_related(p[i], "friendOf")]

    engine.run(txn)
    t = engine.read()
    for i in range(4):
        want_f, want_i = fwd.get(ids[i], []), inv.get(ids[i], [])
        assert in_txn[("fwd", i)] == want_f, f"in-txn fwd of node {i}"
        assert in_txn[("inv", i)] == want_i, f"in-txn inv of node {i}"
        got_f = [x.id for x in t.get_related(p[i], "friend")]
        got_i = [x.id for x in t.get_related(p[i], "friendOf")]
        assert got_f == want_f, f"committed fwd of node {i}"
        assert got_i == want_i, f"committed inv of node {i}"


# -- bloom-filter join pruning (plans/bloom.py) -----------------------------
# the property its transparency claim rests on: NO false negatives, for any
# key sets — every probe row whose key is in the build set survives the
# prune, so prune→exact-join always equals the plain join.

keyset = st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=30)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(build=keyset, probe=keyset)
def test_bloom_prune_never_drops_a_true_match(spark, build, probe):
    from edgy_spark.plans.bloom import bloom_build, bloom_prune

    bdf = _bag_df(spark, build).withColumnRenamed("id", "k")
    pdf = _bag_df(spark, probe).withColumnRenamed("id", "k")
    bloom = bloom_build(bdf, "k", n_bits=1 << 10)  # small filter: high fp, still 0 fn
    pruned = Counter(r.k for r in bloom_prune(pdf, "k", bloom, n_bits=1 << 10).collect())
    in_build = set(build)
    want_at_least = Counter(x for x in probe if x in in_build)
    for key, n in want_at_least.items():
        assert pruned[key] == n, f"false negative for {key}"


# -- span-level dedup / link-prediction / HITS properties -------------------


def test_duplicate_spans_counts_cross_doc_and_within_doc_repeats(
    spark, tmp_path
):
    """A span shared by two documents AND a span repeated inside one
    document both count as duplicated (the Lee et al. suffix-array pass
    matches within-document repeats too); fully unique docs score zero."""
    from edgy_spark.operators.dedup import dedup_duplicate_spans

    shared = "p q r s t u v w"  # exactly SPAN_K=8 words
    rep = "z1 z2 z3 z4 z5 z6 z7 z8"
    docs = [
        (1, f"{shared} a1 a2"),          # 3 spans, 1 duplicated (shared)
        (2, f"b1 b2 {shared}"),          # 3 spans, 1 duplicated (shared)
        (3, "c1 c2 c3 c4 c5 c6 c7 c8"),  # 1 span, unique
        (4, f"{rep} {rep}"),             # within-doc repeat of `rep`
        (5, "short doc"),                # < 8 words: no spans, absent
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in dedup_duplicate_spans(spark, str(tmp_path)).collect()
    }
    assert got[1] == (3, 1) and got[2] == (3, 1)
    assert got[3] == (1, 0)
    n_spans4, n_dup4 = got[4]
    assert n_spans4 == 9  # 16 words -> 9 positions
    assert n_dup4 >= 2  # positions 1 and 9 are the identical span `rep`
    assert 5 not in got  # zero-span docs drop out on both engines


def test_common_neighbors_stop_part_cap_bounds_pair_explosion(
    spark, tmp_path, monkeypatch
):
    """A part bought by more than CN_MAX_DF customers must contribute no
    pairs AND no degree mass: with the cap at 3, a 5-buyer part vanishes
    and the surviving pair's Jaccard is computed over the capped universe
    (1/1, not 1/3)."""
    from edgy_spark.operators import graph_algos

    orders = [(c * 10, c) for c in range(1, 6)]
    lineitem = [(c * 10, 100) for c in range(1, 6)]  # stop part: DF=5
    lineitem += [(10, 200), (20, 200)]  # rare part shared by custs 1,2
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    monkeypatch.setattr(graph_algos, "CN_MAX_DF", 3)
    rows = graph_algos.graph_common_neighbors(spark, str(tmp_path)).collect()
    assert [(r.cust_a, r.cust_b, r.n_common, r.jaccard) for r in rows] == [
        (1, 2, 1, 1.0)
    ]


def _naive_bpe(word_counts: dict[str, int], rounds: int):
    """Reference BPE trainer: the textbook greedy leftmost non-overlapping
    re-scan (Sennrich et al. 2016), deliberately implemented the naive way
    so it shares NO code shape with the engine's fold formulation.
    Symbols are the r14 byte-level alphabet: UTF-8 bytes as uppercase hex
    pairs (computed here via Python's own codec, not the engine's SQL)."""

    def to_syms(w: str) -> list[str]:
        h = w.encode("utf-8").hex().upper()
        return [h[i : i + 2] for i in range(0, len(h), 2)]

    seqs = [(to_syms(w), c) for w, c in sorted(word_counts.items())]
    merges = []
    for rank in range(1, rounds + 1):
        from collections import Counter

        pc: Counter = Counter()
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), tot = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, tot))
        new = []
        for syms, c in seqs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new.append((out, c))
        seqs = new
    return merges


def test_bpe_trainer_equals_reference_scan(spark, tmp_path):
    """The distributed trainer (word-type table + string fold) must learn
    exactly the merges the textbook re-scan learns — including greedy
    leftmost behavior on self-overlapping pairs (aaaa -> (aa)(aa)) and
    merged symbols participating in later rounds."""
    from edgy_spark.operators.text import text_bpe_train_merges

    docs = [
        (1, "aaaa aaaa banana"),
        (2, "banana bandana aaaa"),
        (3, "an anna banana ban"),
        (4, "naan naan naan a"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    counts: dict[str, int] = {}
    for _, t in docs:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = _naive_bpe(counts, 4)
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.n_occurrences)
        for r in text_bpe_train_merges(spark, str(tmp_path))
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


def test_bpe_trainer_property_random_corpora(spark, tmp_path):
    """Hypothesis-style sweep without Spark in the loop being too slow:
    several seeded random corpora, trainer == reference on every one."""
    import random

    from edgy_spark.operators.text import text_bpe_train_merges

    for seed in (0, 7):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(30)
        ]
        text = " ".join(words)
        path = tmp_path / f"c{seed}"
        path.mkdir()
        spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        ).write.parquet(str(path / "documents.parquet"))
        counts: dict[str, int] = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        want = _naive_bpe(counts, 4)
        got = [
            (r.merge_rank, r.left_sym, r.right_sym, r.n_occurrences)
            for r in text_bpe_train_merges(spark, str(path))
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == want, f"seed {seed}"


def _naive_words(text: str) -> list[str]:
    import re as _re

    return _re.findall(r"[^ \t\n\r]+", text)


def _naive_tokenize_ids(text: str, merges) -> list[int]:
    """Reference frozen-vocab tokenizer: naive per-word greedy leftmost
    re-scan of each trained merge in rank order over the r14 BYTE-LEVEL
    alphabet (UTF-8 bytes as hex-pair symbols via Python's own codec),
    then the vocab id convention (byte b → b+1, merge r's surface →
    256+r, earliest merge wins a surface collision) — shares no code
    shape with the engine's fold/when-chain formulation."""
    vocab = {}
    for rank, a, b, _ in merges:
        vocab.setdefault(a + b, 256 + rank)
    ids: list[int] = []
    for w in _naive_words(text):
        h = w.encode("utf-8").hex().upper()
        syms = [h[i : i + 2] for i in range(0, len(h), 2)]
        for _, a, b, _tot in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        ids.extend(
            vocab[s] if len(s) > 2 else int(s, 16) + 1 for s in syms
        )
    return ids


def test_tokenize_ids_equal_reference_scan(spark, tmp_path):
    """The zero-shuffle in-row tokenizer must emit exactly the token-id
    sequence the textbook re-scan produces — including merged symbols
    spanning later merges, the self-overlap greedy-leftmost case, and
    (r14) digit/punctuation words the byte-level alphabet now keeps."""
    from edgy_spark.operators.text import bpe_token_ids

    docs = [
        (1, "aaaa aaaa banana"),
        (2, "banana bandana aaaa"),
        (3, "an anna banana ban 123 !!"),
        (4, "naan naan naan a"),
        (5, "mixed 42 digits and words 7"),
        (6, "   \t  "),  # whitespace-only → empty sequence
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    counts: dict[str, int] = {}
    for _, t in docs:
        for w in _naive_words(t):
            counts[w] = counts.get(w, 0) + 1
    merges = _naive_bpe(counts, 4)
    got = {
        r.doc_id: list(r.token_ids)
        for r in bpe_token_ids(spark, str(tmp_path)).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _naive_tokenize_ids(text, merges), doc_id
    assert got[6] == []


def test_tokenize_ids_query_scalars_pin_the_sequence(spark, tmp_path):
    """The gated projection (count / endpoints / position-weighted
    checksum) must derive from the reference sequence; whitespace-only
    documents emit (0, NULL, NULL, 0).  Punctuation/digit documents are
    REAL sequences under the r14 byte-level alphabet and pin the same
    scalars."""
    from edgy_spark.operators.text import text_tokenize_ids

    docs = [(1, "abab abab baba"), (2, "??? 88 ---"), (3, " \t ")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    counts: dict[str, int] = {}
    for _, t in docs:
        for w in _naive_words(t):
            counts[w] = counts.get(w, 0) + 1
    merges = _naive_bpe(counts, 4)
    rows = {r.doc_id: r for r in text_tokenize_ids(spark, str(tmp_path)).collect()}
    for doc_id, text in docs[:2]:
        seq = _naive_tokenize_ids(text, merges)
        r = rows[doc_id]
        assert r.n_tokens == len(seq) > 0, doc_id
        assert r.first_id == seq[0] and r.last_id == seq[-1], doc_id
        assert r.id_checksum == sum(v * (i + 1) for i, v in enumerate(seq))
    r3 = rows[3]
    assert (r3.n_tokens, r3.first_id, r3.last_id, r3.id_checksum) == (0, None, None, 0)


def test_hits_scores_are_positive_and_sum_normalized(spark):
    """Every HITS authority/hub score is positive and each rescaled vector
    sums into (SCALE - n, SCALE] — the floor-division mass bound that makes
    the scaled-integer normalization well-defined at any graph size."""
    from edgy_spark.operators.graph_algos import (
        HITS_SCALE,
        hits_scaled,
        purchase_edges,
    )
    from tests.conftest import SF_SMOKE

    auth, hub = hits_scaled(purchase_edges(spark, SF_SMOKE))
    for df, col in ((auth, "auth"), (hub, "hub")):
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).alias("lo"),
            F.sum(col).alias("s"),
        ).collect()[0]
        assert agg.lo > 0
        assert HITS_SCALE - agg.n < agg.s <= HITS_SCALE


def test_dsir_fails_loudly_without_target_documents(spark, tmp_path):
    """No target-language documents -> the weight is undefined; the
    operator must raise, not hand a resampler an all-NULL column."""
    import pytest

    from edgy_spark.operators.pipeline import (
        pipeline_dsir_importance_weights,
    )

    spark.createDataFrame(
        [(1, "fr", "bonjour le monde"), (2, "de", "hallo welt")],
        "doc_id long, lang string, text string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    # pyspark surfaces raise_error as SparkRuntimeException; match the
    # message rather than pin the (version-dependent) wrapper class
    with pytest.raises(Exception, match="importance weights undefined"):
        pipeline_dsir_importance_weights(spark, str(tmp_path)).collect()


def test_trim_duplicate_spans_keeps_first_occurrence(spark, tmp_path):
    """Hand-checkable span trimming: docs 1 and 2 share the 8-gram
    'a b c d e f g h'; doc 1 (min doc_id) keeps it, doc 2 loses exactly
    those 8 words; doc 3 shares no 8-gram and is untouched."""
    from edgy_spark.operators.dedup import dedup_trim_duplicate_spans

    docs = [
        (1, "a b c d e f g h tail one"),
        (2, "a b c d e f g h tail two"),
        (3, "totally different words that never repeat anywhere at all"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: (r.trimmed_text, r.n_words, r.n_words_dropped)
        for r in dedup_trim_duplicate_spans(spark, str(tmp_path)).collect()
    }
    # doc 2's duplicated occurrences: positions 1 and 2 (8-grams 'a..h'
    # and 'b..tail' — position 3's gram ends in 'two' and is unique), so
    # words 1..9 are covered and only 'two' survives
    assert out[1] == ("a b c d e f g h tail one", 10, 0)
    assert out[2] == ("two", 10, 9)
    assert out[3] == (
        "totally different words that never repeat anywhere at all", 9, 0,
    )


def test_priority_sample_deterministic_and_weight_dominant(spark, tmp_path):
    """Priority sampling: two runs agree exactly (hash draw, not RNG); a
    document whose weight exceeds every possible 1/u (> 2^60) is ALWAYS
    sampled; sample size is exactly PRIO_K."""
    from edgy_spark.operators.pipeline import PRIO_K, pipeline_priority_sample

    rows = [(i, f"doc {i}", "en", "crawl", 1) for i in range(200)]
    rows.append((999, "heavy", "en", "curated", 9 * 10**18))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    a = pipeline_priority_sample(spark, str(tmp_path)).collect()
    b = pipeline_priority_sample(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == PRIO_K
    assert a[0].doc_id == 999  # priority = w/u >= 9e18 > max 1/u ~ 1.2e18


def test_prefix_filter_is_exact_and_prunes(spark, tmp_path):
    """Prefix filtering must lose NO qualifying pair (the oracle equality
    is the corpus-level proof; this pins a handmade corpus where the only
    shared token of the near-dup pair is mid-rarity), while a ubiquitous
    boilerplate shingle shared by EVERY doc stays out of most prefixes."""
    from edgy_spark.operators.dedup import (
        dedup_prefix_filter_jaccard_pairs,
        _pfx_prefix_tokens,
    )

    # docs 1/2: identical but for the last word -> high Jaccard; docs
    # 3..8: share only the 'common suffix run' boilerplate 5-gram
    boiler = "zz yy xx ww vv"
    common = ("alpha beta gamma delta epsilon zeta eta kappa lambda mu "
              "nu xi omicron pi rho sigma tau upsilon phi chi")
    docs = [
        (1, f"{common} {boiler} theta"),   # differ only in the last word:
        (2, f"{common} {boiler} iota"),    # 17 of 22 shingles shared, J=17/27
    ] + [(i, f"unique{i} u{i}a u{i}b u{i}c u{i}d " + boiler) for i in range(3, 9)]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = dedup_prefix_filter_jaccard_pairs(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1, 2)]
    assert rows[0].jaccard > 0.5

    # pruning: the boilerplate token (df = 8, the corpus maximum) must be
    # absent from the prefixes of the docs that have rarer tokens to offer
    from pyspark.sql import functions as F
    from edgy_spark.functions.hashing import h60
    from edgy_spark.operators.dedup import PFX_K, _kgrams
    from edgy_spark.sources import load

    d = load(spark, str(tmp_path), "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(_kgrams(PFX_K))).alias("t")
    ).select("doc_id", h60(F.col("t")).alias("hs"))
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    prefix = _pfx_prefix_tokens(tok, sz)
    dfmax = tok.groupBy("hs").count().orderBy(F.desc("count")).first()
    n_prefix_holders = prefix.filter(F.col("hs") == dfmax["hs"]).count()
    assert dfmax["count"] == 8          # the boilerplate 5-gram
    assert n_prefix_holders == 0        # ...never reaches any prefix


@settings(deadline=None, max_examples=8, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.integers(min_value=1, max_value=40000), min_size=16, max_size=28
    ),
    shift_c=st.integers(min_value=-500, max_value=500),
    spike=st.integers(min_value=100000, max_value=4000000),
)
def test_anomaly_flags_are_translation_invariant_and_catch_spikes(
    spark, vals, shift_c, spike
):
    """The exact-integer z^2 predicate behind events_anomaly_zscore:
    (1) adding a constant to EVERY value leaves the flagged set unchanged
    (dev and var_term are both translation-invariant — this is exactly
    what a float mean/variance would not guarantee bit-for-bit), and
    (2) a large spike appended after a long benign history is flagged.
    """
    from datetime import datetime, timedelta

    from edgy_spark.operators.asof import ANOM_MIN_N, anomaly_zscore_flags

    base = datetime(2024, 1, 1)
    # keep history variance > 0 and below-spike: alternate +/- jitter
    rows = [
        (i, 1, base + timedelta(minutes=i), (v + (i % 3)) / 100.0)
        for i, v in enumerate(vals)
    ]
    rows.append((len(vals), 1, base + timedelta(minutes=len(vals)), spike / 100.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    flagged = {
        r["event_id"] for r in anomaly_zscore_flags(df).collect()
    }
    assert len(vals) in flagged, "the planted spike must be flagged"

    shifted = df.withColumn(
        "value", F.round(F.col("value") + shift_c, 2)
    )
    flagged_shifted = {
        r["event_id"] for r in anomaly_zscore_flags(shifted).collect()
    }
    assert flagged == flagged_shifted
    assert ANOM_MIN_N <= len(vals) + 1


def test_url_canonicalization_is_a_projection(spark):
    """canonical(canonical(x)) == canonical(x): the canonicalizer must be
    idempotent (a projection), or re-processing an already-clean corpus
    would split dup groups.  Checked over every synthesized raw URL in
    the fixture id range PLUS the canonical outputs fed back through the
    parser — which also proves a canonical URL parses as a valid URL."""
    from edgy_spark.operators.dedup import _canonical_parts, _raw_url

    ids = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    c1, h1 = _canonical_parts(_raw_url())
    once = ids.select(
        "doc_id", c1.alias("canonical"), h1.alias("host")
    )
    c2, h2 = _canonical_parts(F.col("canonical"))
    twice = once.select(
        "doc_id", "canonical", "host",
        c2.alias("canonical2"), h2.alias("host2"),
    )
    bad = twice.filter(
        (F.col("canonical") != F.col("canonical2"))
        | (F.col("host") != F.col("host2"))
    )
    assert bad.count() == 0, bad.limit(5).collect()
