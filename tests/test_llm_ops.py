"""Property tests for the LLM-pipeline text operators (t10-t12, x06)
beyond their DuckDB oracle rows: invariants a hash compare can't state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alternating_least_squares_spark import registry
from alternating_least_squares_spark.registry import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    DOMAIN_CAP,
)
from alternating_least_squares_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_chunks_reassemble_to_original_text(spark):
    """Every document must be exactly recoverable from its chunks:
    chunk 0 whole, later chunks contribute their tail beyond the
    overlap. The strongest possible statement that chunking loses no
    bytes and overlaps are consistent."""
    docs = {
        r["doc_id"]: r["text"] or ""
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    chunk_df = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            "doc_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    (
                        F.floor(
                            (
                                F.greatest(
                                    F.length(F.coalesce("text", F.lit(""))),
                                    F.lit(1),
                                )
                                - 1
                            )
                            / CHUNK_STRIDE
                        )
                        * CHUNK_STRIDE
                    ).cast("int"),
                    F.lit(CHUNK_STRIDE),
                )
            ).alias("chunk_idx", "start"),
        )
        .join(load_table(spark, SF_SMALL, "documents"), "doc_id")
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(
                F.coalesce("text", F.lit("")), F.col("start") + 1, CHUNK_LEN
            ).alias("chunk"),
        )
        .collect()
    )
    by_doc: dict[int, dict[int, str]] = {}
    for r in chunk_df:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
    overlap = CHUNK_LEN - CHUNK_STRIDE
    for doc_id, chunks in by_doc.items():
        rebuilt = chunks[0]
        for i in range(1, len(chunks)):
            rebuilt += chunks[i][overlap:] if len(chunks[i]) > overlap else ""
        assert rebuilt == docs[doc_id], doc_id
    assert set(by_doc) == set(docs)


def test_chunk_query_matches_helper_shapes(spark):
    """t10's own output: every chunk is non-empty, <= CHUNK_LEN, and
    doc chunk counts follow ceil(len/stride) of the source text."""
    import math

    rows = registry.queries()["t10_chunk_windows"](spark, SF_SMALL).collect()
    docs = {
        r["doc_id"]: r["text"] or ""
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    counts: dict[int, int] = {}
    for r in rows:
        assert 1 <= r["chunk_len"] <= CHUNK_LEN
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    for doc_id, text in docs.items():
        # last window starts at floor((len-1)/stride)*stride
        expect = (max(len(text), 1) - 1) // CHUNK_STRIDE + 1
        assert counts[doc_id] == expect, (doc_id, len(text))


def test_pii_redaction_removes_every_planted_match(spark):
    """After redaction no email/phone pattern may survive, and the
    per-doc counts must be >= 1 (one of each is planted)."""
    docs = load_table(spark, SF_SMALL, "documents")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    from alternating_least_squares_spark.registry import _PII_EMAIL, _PII_PHONE

    redacted = F.regexp_replace(
        F.regexp_replace(planted, _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    leftovers = docs.select(
        F.sum(F.regexp_count(redacted, F.lit(_PII_EMAIL))).alias("e"),
        F.sum(F.regexp_count(redacted, F.lit(_PII_PHONE))).alias("p"),
    ).first()
    assert leftovers["e"] == 0 and leftovers["p"] == 0
    counts = registry.queries()["t11_pii_redact"](spark, SF_SMALL).collect()
    assert all(r["n_emails"] >= 1 and r["n_phones"] >= 1 for r in counts)


def test_repetition_stats_bounds(spark):
    """dup fraction in [0, 1); top share in (0, 1]; and top share can
    never be below 1/n_tokens (some token attains the max)."""
    rows = registry.queries()["t12_repetition_stats"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] < 1.0, r
        assert 0.0 < r["top_token_share"] <= 1.0, r
        # 6dp output rounding can undercut the exact 1/n by 5e-7
        assert r["top_token_share"] >= 1.0 / r["n_tokens"] - 1e-6, r


def test_domain_mix_caps_every_source(spark):
    """Kept count per source must be <= ~cap with hash-binomial slack,
    and sources at-or-under the cap survive whole."""
    base = {
        r["source"]: r["count"]
        for r in load_table(spark, SF_SMALL, "documents")
        .groupBy("source")
        .count()
        .collect()
    }
    kept = {
        r["source"]: r["count"]
        for r in registry.queries()["x06_domain_mix_sample"](spark, SF_SMALL)
        .groupBy("source")
        .count()
        .collect()
    }
    for src, n in base.items():
        k = kept.get(src, 0)
        if n <= DOMAIN_CAP:
            assert k == n, src
        else:
            # rate = cap/n; binomial(n, rate) stays within 3 sigma
            import math

            rate = DOMAIN_CAP / n
            sigma = math.sqrt(n * rate * (1 - rate))
            assert k <= DOMAIN_CAP + 3 * sigma + 1, (src, k)


def test_sentence_split_matches_python_reference(spark):
    """t15 brute force: random punctuation-heavy strings, the Spark
    split/trim/renumber pipeline must equal a plain-Python reference."""
    import hashlib
    import random
    import re

    rng = random.Random(23)
    words = ["alpha", "beta", "gamma", "", " ", "x1"]
    puncts = [".", "!", "?", "...", "?!", ""]
    docs = []
    for i in range(40):
        s = "".join(
            rng.choice(words) + rng.choice([" ", "  ", ""]) + rng.choice(puncts)
            for _ in range(rng.randint(0, 8))
        )
        docs.append((i, s))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # same expressions as the t15 registry entry (kept in lockstep with
    # its oracle), brute-forced here on adversarial literals
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = {}
    parts = df.select(
        "doc_id",
        F.posexplode(F.split(df.text, r"[.!?]+")).alias("pos", "raw"),
    )
    sent = parts.withColumn(
        "sent", F.regexp_replace(F.col("raw"), r"^\s+|\s+$", "")
    ).filter(F.col("sent") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    out = sent.select(
        "doc_id",
        (F.row_number().over(w) - 1).alias("sent_idx"),
        F.md5("sent").alias("m"),
    )
    for r in out.collect():
        got[(r["doc_id"], r["sent_idx"])] = r["m"]

    want = {}
    for i, s in docs:
        idx = 0
        for piece in re.split(r"[.!?]+", s):
            piece = re.sub(r"^\s+|\s+$", "", piece)
            if piece:
                want[(i, idx)] = hashlib.md5(piece.encode()).hexdigest()
                idx += 1
    assert got == want


def test_market_basket_lift_matches_brute_force(spark):
    """m04 shape on a hand-built basket set: exact pair counts and
    lift against itertools-computed truth."""
    import itertools

    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [10, 20, 40],
        4: [20, 30],
        5: [10],
    }
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from pyspark.sql import functions as F

    n_orders = len(baskets)
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    margins = {p: sum(1 for ps in baskets.values() if p in ps)
               for p in {10, 20, 30, 40}}
    got = {(r["pa"], r["pb"]): r["n_ab"] for r in pairs.collect()}
    want = {}
    for ps in baskets.values():
        for x, y in itertools.combinations(sorted(ps), 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    assert got == want
    # lift spot check: (10,20) appears 3x; n_10=4, n_20=4, N=5
    lift = 3 * n_orders / (margins[10] * margins[20])
    assert abs(lift - 0.9375) < 1e-12


def test_unigram_logprob_hand_computed(spark, tmp_path, monkeypatch):
    """t18 on a 2-doc corpus where the LM is computable by hand:
    corpus = 'a a b' + 'a c' → counts a:3,b:1,c:1; N=5, V=3, N+V=8.
    lp(a)=ln(4/8), lp(b)=lp(c)=ln(2/8), floored to micro-nats; doc
    sums are exact integers."""
    import math

    from alternating_least_squares_spark.registry import queries

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    import alternating_least_squares_spark.registry as R

    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["sum_lp_us"], r["avg_logprob"])
        for r in queries()["t18_unigram_logprob"](spark, "ignored").collect()
    }
    lp_a = math.floor(math.log(4 / 8) * 1_000_000)
    lp_bc = math.floor(math.log(2 / 8) * 1_000_000)
    # the integer micro-nat sums are the exact pins; the avg is their
    # division rounded HALF-AWAY-FROM-ZERO (Spark round == DuckDB
    # round; Python's round() is banker's and lands one ulp off at
    # exact .5 boundaries like doc 1's -1.0397215, so compare within
    # half an output ulp instead)
    assert (out[0][0], out[0][1]) == (3, 2 * lp_a + lp_bc)
    assert (out[1][0], out[1][1]) == (2, lp_a + lp_bc)
    assert abs(out[0][2] - (2 * lp_a + lp_bc) / 3 / 1e6) <= 5.1e-7
    assert abs(out[1][2] - (lp_a + lp_bc) / 2 / 1e6) <= 5.1e-7


def test_bigram_logprob_hand_computed(spark, monkeypatch):
    """t19 on a corpus computable by hand: docs 'a b a b' + 'a b' +
    'x' (no bigrams → absent). Bigram stream: (a b)x3, (b a)x1.
    c1: a·=3, b·=1. V = 2 (a, b — the bigram-participating vocab;
    'x' never enters a bigram so it is outside the smoothing base).
    lp(a b)=ln(4/5), lp(b a)=ln(2/3)."""
    import math

    from alternating_least_squares_spark.registry import queries
    import alternating_least_squares_spark.registry as R

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "x")],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["sum_lp_us"])
        for r in queries()["t19_bigram_logprob"](spark, "ignored").collect()
    }
    lp_ab = math.floor(math.log(4 / 5) * 1_000_000)
    lp_ba = math.floor(math.log(2 / 3) * 1_000_000)
    assert out[0] == (3, 2 * lp_ab + lp_ba)
    assert out[1] == (1, lp_ab)
    assert 2 not in out  # single-token doc has no bigrams


def test_line_dedup_drops_boilerplate_and_reassembles_in_order(
    spark, monkeypatch
):
    """t20 on a planted corpus: a sentence shared by 12 docs (>= the
    10-doc threshold) is dropped everywhere; unique sentences survive
    in original order (the md5 checks the exact reassembled string)."""
    import hashlib

    import alternating_least_squares_spark.registry as R
    from alternating_least_squares_spark.registry import queries

    rows = [
        # doc 200+i: unique head, boilerplate middle, unique tail
        (200 + i, f"alpha{i} one. COMMON BOILER LINE. omega{i} two.")
        for i in range(12)
    ] + [(300, "standalone text with no boiler. second bit.")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: (r["n_sents"], r["n_kept"], r["n_dropped"], r["clean_md5"])
        for r in queries()["t20_line_dedup"](spark, "ignored").collect()
    }
    for i in range(12):
        exp = f"alpha{i} one. omega{i} two"
        assert out[200 + i] == (
            3, 2, 1, hashlib.md5(exp.encode()).hexdigest()
        ), i
    exp300 = "standalone text with no boiler. second bit"
    assert out[300] == (2, 2, 0, hashlib.md5(exp300.encode()).hexdigest())


def test_repeated_spans_hand_computed(spark, monkeypatch):
    """t21 on a corpus computable by hand. doc ids are ≡ 0 (mod 7) so
    the registry's own planting branch stays inert and the fixture
    controls every token. An 8-token span shared MID-doc (doc 0, after
    3 unique tokens) and at position 0 (doc 7) must be found at BOTH
    positions — the property that separates span detection from
    line/doc dedup; a doc of 14 unique tokens (doc 14) has windows
    but zero repeats; a 7-token doc (doc 21) has no windows at all."""
    from alternating_least_squares_spark.registry import queries
    import alternating_least_squares_spark.registry as R

    span = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (0, f"u0a u0b u0c {span} u0d u0e u0f"),
            (7, f"{span} u7a u7b u7c u7d u7e u7f"),
            (14, " ".join(f"v{i}" for i in range(14))),
            (21, " ".join(f"w{i}" for i in range(7))),
        ],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["n_rep"], r["min_rep_pos"])
        for r in queries()["t21_repeated_spans"](spark, "ignored").collect()
    }
    assert out[0] == (7, 1, 3)
    assert out[7] == (7, 1, 0)
    assert out[14] == (7, 0, None)
    assert 21 not in out  # < 8 tokens: no windows, no row


def test_t21_registry_row_is_not_vacuous(spark):
    """The driver row must detect the planted span at every sf: every
    %7==1 doc carries it as a PREFIX (min_rep_pos must be 0 with ≥4
    repeated windows — the 11-token span spans windows 0..3), and
    %7==2 docs carry it as a suffix (repeated windows exist, at a
    doc-dependent position)."""
    from alternating_least_squares_spark.registry import queries

    rows = queries()["t21_repeated_spans"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    pre = [r for r in rows if r["doc_id"] % 7 == 1]
    suf = [r for r in rows if r["doc_id"] % 7 == 2]
    assert pre and suf, "planted-span doc classes missing at sf0.001"
    assert all(r["min_rep_pos"] == 0 and r["n_rep"] >= 4 for r in pre)
    assert all(r["n_rep"] >= 4 for r in suf)


def test_bpe_merge_pairs_hand_computed(spark, monkeypatch):
    """t22 on a corpus computable by hand: words abab×2, cd×2, xy×1
    (case-folded, punctuation splits words). Pair table: ab=4 (two per
    'abab' occurrence), ba=2, cd=2, xy=1; the freq-desc/pair-asc rank
    breaks the ba/cd tie lexically."""
    from alternating_least_squares_spark.registry import queries
    import alternating_least_squares_spark.registry as R

    docs = spark.createDataFrame(
        [(0, "Abab abab, cd!"), (1, "CD xy9")],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    got = [
        (r["pair"], r["freq"], r["rnk"])
        for r in queries()["t22_bpe_merge_pairs"](spark, "ignored")
        .orderBy("rnk")
        .collect()
    ]
    assert got == [("ab", 4, 1), ("ba", 2, 2), ("cd", 2, 3), ("xy", 1, 4)]


def test_training_shuffle_is_a_deterministic_permutation(spark):
    """x16: every doc appears exactly once; shards are the 16 hex
    nibbles; positions are dense 1..n within each shard; and the
    mapping is the pinned md5 — spot-checked against hashlib so an
    engine-side hash change cannot slip through."""
    import hashlib

    from alternating_least_squares_spark.registry import queries
    from alternating_least_squares_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = queries()["x16_training_shuffle"](spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r["shard"] <= 15
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    some = rows[0]
    digest = hashlib.md5(f"shuf:{some['doc_id']}".encode()).hexdigest()
    assert some["shard"] == int(digest[0], 16)


def test_neardup_keep_one_collapses_transitively(spark, monkeypatch):
    """d11 on a planted graph: three byte-distinct docs with the SAME
    token sequence (whitespace variants) must collapse into ONE
    cluster of 3 via pairs→components→keep-one — the transitive case
    a pairwise keep-one (d06) can get wrong; a unique doc stays a
    singleton; a %10==0 doc gains the registry's own planted variant
    as a cluster of 2."""
    from alternating_least_squares_spark.registry import queries
    import alternating_least_squares_spark.registry as R

    base = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace(" ", "  ")),
            (3, base.replace(" ", "   ")),
            (4, " ".join(f"uniq{i}" for i in range(30))),
            (10, " ".join(f"ten{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: r["n_merged"]
        for r in queries()["d11_neardup_keep_one"](spark, "ignored").collect()
    }
    assert out == {1: 3, 4: 1, 10: 2}


def test_dsir_weights_hand_computed(spark, monkeypatch):
    """x17 on a corpus computable by hand: target slice (en) = 'a a b',
    raw adds 'b c' (de). Per-term counts (raw, target): a=(2,2),
    b=(2,1), c=(1,0); N_raw=5, N_tgt=3, V=3 → denominators 8 and 6.
    Every per-term weight is the DIFFERENCE of separately-floored
    micro-nat log-probs — pinned against python math.floor."""
    import math

    from alternating_least_squares_spark.registry import queries
    import alternating_least_squares_spark.registry as R

    docs = spark.createDataFrame(
        [(0, "a a b", "en"), (1, "b c", "de")],
        "doc_id long, text string, lang string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["w_us"], r["keep"])
        for r in queries()["x17_dsir_weights"](spark, "ignored").collect()
    }

    def dw(ct, cc):
        return math.floor(math.log((ct + 1) / 6) * 1_000_000) - math.floor(
            math.log((cc + 1) / 8) * 1_000_000
        )

    dwa, dwb, dwc = dw(2, 2), dw(1, 2), dw(0, 1)
    assert out[0] == (3, 2 * dwa + dwb, 2 * dwa + dwb > 0)
    assert out[1] == (2, dwb + dwc, dwb + dwc > 0)


def test_span_scrub_removes_exactly_the_shared_span(spark, monkeypatch):
    """t23 on the t21 fixture: the 8-token span shared by docs 0 and 7
    is scrubbed from BOTH — mid-doc and prefix positions — leaving
    exactly the surrounding unique tokens; untouched docs keep their
    full token stream byte-for-byte (boundary windows are unique, so
    coverage must stop at the span edge)."""
    import hashlib

    from alternating_least_squares_spark.registry import queries
    import alternating_least_squares_spark.registry as R

    span = " ".join(f"s{i}" for i in range(8))
    doc14 = " ".join(f"v{i}" for i in range(14))
    doc21 = " ".join(f"w{i}" for i in range(7))
    docs = spark.createDataFrame(
        [
            (0, f"u0a u0b u0c {span} u0d u0e u0f"),
            (7, f"{span} u7a u7b u7c u7d u7e u7f"),
            (14, doc14),
            (21, doc21),
        ],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_md5"])
        for r in queries()["t23_span_scrub"](spark, "ignored").collect()
    }

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[0] == (14, 6, h("u0a u0b u0c u0d u0e u0f"))
    assert out[7] == (14, 6, h("u7a u7b u7c u7d u7e u7f"))
    assert out[14] == (14, 14, h(doc14))
    assert out[21] == (7, 7, h(doc21))


def test_span_scrub_matches_python_reference(spark):
    """t23 against a from-scratch python reimplementation over the
    WHOLE sf0.001 corpus (planting, repeated-window set, coverage,
    reconstruction): every doc's (n_tokens, n_kept, clean_md5) must
    match exactly. This also documents a real property of the planted
    construction: %7==1 docs share the 11-token prefix, so a boundary
    window (span tail + first text tokens) repeats whenever two docs
    share their leading text tokens — coverage then legitimately
    extends past the span, which a naive "exactly 11 scrubbed"
    expectation gets wrong."""
    import hashlib
    from collections import defaultdict

    from alternating_least_squares_spark.registry import _T21_SPAN, queries
    from alternating_least_squares_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    raw = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents").collect()
    }
    toks = {}
    for did, text in raw.items():
        if did % 7 == 1:
            p = _T21_SPAN + " " + (text or "")
        elif did % 7 == 2:
            p = (text or "") + " " + _T21_SPAN
        else:
            p = text
        toks[did] = (p or "").split()
    gram_docs = defaultdict(set)
    for did, ts in toks.items():
        for i in range(len(ts) - 7):
            gram_docs[tuple(ts[i:i + 8])].add(did)
    rep = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = {}
    for did, ts in toks.items():
        if not ts:
            continue
        cov = set()
        for i in range(len(ts) - 7):
            if tuple(ts[i:i + 8]) in rep:
                cov.update(range(i, i + 8))
        kept = [t for i, t in enumerate(ts) if i not in cov]
        expected[did] = (
            len(ts),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_md5"])
        for r in queries()["t23_span_scrub"](spark, sf).collect()
    }
    assert got == expected


def test_training_pipeline_gate_and_order_are_sane(spark):
    """p03 at sf0.001: the quality gate must be NON-degenerate (some
    docs pass, some fail — a 0% or 100% gate would make the driver
    row vacuous about the threshold), every survivor's avg exceeds
    the −3.402 threshold, and the shard/pos order is a dense
    per-shard permutation (the x16 contract carried through the
    chain)."""
    from alternating_least_squares_spark.registry import queries
    from alternating_least_squares_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = queries()["p03_training_pipeline"](spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert 0 < len(rows) < n_docs
    by_shard: dict = {}
    for r in rows:
        assert r["sum_lp_us"] > r["n_kept"] * -3_402_000
        assert 0 <= r["shard"] <= 15
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_quantile_gate_decile_spec(spark):
    """q03: the histogram-bucket decile gate must satisfy its spec
    exactly — every kept bucket ≥ every dropped bucket (the gate is a
    clean threshold), the dropped count is < k = ceil(n/10), and
    adding the threshold bucket's own mass reaches k (so the
    threshold is the MINIMAL bucket whose cumulative count covers
    the decile)."""
    from collections import Counter

    from alternating_least_squares_spark.registry import (
        q_q03_quantile_gate,
        q_t18_unigram_logprob,
    )
    from tests.conftest import SF_SMALL

    kept = {
        r["doc_id"]: r["bucket"]
        for r in q_q03_quantile_gate(spark, SF_SMALL).collect()
    }
    t18 = q_t18_unigram_logprob(spark, SF_SMALL).collect()
    # python's // IS floor division — exactly the _floor_div chain
    all_buckets = {
        r["doc_id"]: r["sum_lp_us"] // r["n_tokens"] // 1000
        for r in t18
    }
    n = len(all_buckets)
    k = (n + 9) // 10
    dropped = {d: b for d, b in all_buckets.items() if d not in kept}
    assert kept and dropped
    assert max(dropped.values()) <= min(kept.values())
    thr = min(kept.values())
    hist = Counter(all_buckets.values())
    below = sum(c for b, c in hist.items() if b < thr)
    assert below < k <= below + hist[thr]
    # kept values match the t18-derived buckets exactly
    assert kept == {d: b for d, b in all_buckets.items() if b >= thr}


def test_psi_drift_matches_python_reference(spark):
    """q04: the per-(source, bucket) PSI terms must equal a plain
    Python recomputation from the same (source, bucket) assignments
    — exercising the dense grid (empty bins present), Laplace
    smoothing, the micro-nat floor, and the scalar corpus total. PSI
    terms are also individually non-negative ((p−q) and ln(p/q)
    always share a sign, and flooring the log toward −∞ preserves
    it)."""
    import math
    from collections import Counter

    from alternating_least_squares_spark.functions import textfns as TX

    qb = [
        (r["source"], r["bucket"])
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.least(
                F.floor(TX.quality_score(F.col("text")) * 10), F.lit(9)
            ).cast("long").alias("bucket"),
        )
        .collect()
    ]
    n = len(qb)
    c_sb = Counter(qb)
    n_s = Counter(s for s, _ in qb)
    c_b = Counter(b for _, b in qb)
    want = {}
    for s in n_s:
        for b in range(10):
            p_src = (c_sb[(s, b)] + 1) / (n_s[s] + 10)
            p_corp = (c_b[b] + 1) / (n + 10)
            lp_us = math.floor(math.log(p_src / p_corp) * 1_000_000)
            want[(s, b)] = (
                c_sb[(s, b)], c_b[b], lp_us,
                round((p_src - p_corp) * lp_us / 1_000_000.0, 6),
            )
    got = {
        (r["source"], r["bucket"]):
            (r["c_src"], r["c_corpus"], r["lp_us"], r["psi_term"])
        for r in registry.queries()["q04_psi_drift"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == want
    assert len(got) == len(n_s) * 10  # dense grid, empty bins included
    assert all(v[3] >= 0 for v in got.values())


def test_drift_gated_admission_gate_and_dedup_both_fire(spark):
    """p04: every admitted doc is (a) from a source whose drift is
    under the gate, (b) a batch doc whose content hash is unseen in
    the corpus, and (c) the first of its hash within the batch — and
    on this fixture BOTH gates actually fire (some source is rejected
    wholesale, some fresh docs are deduped away)."""
    from alternating_least_squares_spark.registry import (
        P04_DRIFT_GATE_NANO,
        q_p04_drift_gated_admission,
    )

    rows = q_p04_drift_gated_admission(spark, SF_SMALL).collect()
    assert rows
    assert all(r["drift_nano"] <= P04_DRIFT_GATE_NANO for r in rows)
    assert all(r["doc_id"] % 3 == 0 for r in rows)

    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    ]
    import hashlib

    corpus_fp = {
        hashlib.md5(t.encode()).hexdigest()
        for d, _, t in docs if d % 3 != 0
    }
    batch = [(d, s, hashlib.md5(t.encode()).hexdigest())
             for d, s, t in docs if d % 3 == 0]
    batch_sources = {s for _, s, _ in batch}
    admitted_sources = {r["source"] for r in rows}
    assert admitted_sources < batch_sources  # drift gate rejected someone
    admitted_ids = {r["doc_id"] for r in rows}
    by_fp: dict = {}
    for d, s, fp in sorted(batch):
        by_fp.setdefault(fp, d)
    for d, s, fp in batch:
        if d in admitted_ids:
            assert fp not in corpus_fp       # exact-dedup gate held
            assert by_fp[fp] == d            # first of its hash
        elif s in admitted_sources:
            # a non-admitted doc from an admitted source can only have
            # been removed by the dedup gate
            assert fp in corpus_fp or by_fp[fp] != d
    # every doc that passed BOTH gates is present (the join drops
    # nothing else)
    expect = {
        d for d, s, fp in batch
        if s in admitted_sources and fp not in corpus_fp
        and by_fp[fp] == d
    }
    assert admitted_ids == expect


def test_ngram_decontaminate_matches_python_reference(spark):
    """t24 brute force: recompute eval grams, corpus grams, and the
    per-doc distinct shared-gram counts in plain Python — covering the
    planted probe variants AND the organic contamination the fixture
    carries (the corpus has exact-duplicate texts, so an eval-slice
    doc's duplicate legitimately flags). Every planted variant must be
    present with a count of at least the probe gram."""
    from alternating_least_squares_spark.registry import (
        T24_K,
        T24_PROBE,
        q_t24_ngram_decontaminate,
    )

    got = {
        r["doc_id"]: r["n_shared"]
        for r in q_t24_ngram_decontaminate(spark, SF_SMALL).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }

    def grams(text):
        toks = text.split()
        if len(toks) < T24_K:
            return {" ".join(toks)}
        return {
            " ".join(toks[i : i + T24_K])
            for i in range(len(toks) - T24_K + 1)
        }

    ev = {d: t for d, t in docs.items() if d % 97 == 0}
    ev_grams = set().union(*map(grams, ev.values()), grams(T24_PROBE))
    corpus = {d: t for d, t in docs.items() if d % 97 != 0}
    for d, t in docs.items():
        if d % 10 == 7:
            corpus[d + 30_000_000] = t + " " + T24_PROBE
    want = {}
    for d, t in corpus.items():
        n = len(grams(t) & ev_grams)
        if n:
            want[d] = n
    assert got == want
    planted = {d + 30_000_000 for d in docs if d % 10 == 7}
    assert planted <= set(got)
    assert all(got[d] >= 1 for d in planted)


def test_t25_hash_keys_equal_t24_text_keys(spark):
    """The executable form of t24's web-scale promise: keying the
    decontamination join on the 128-bit gram-hash pair must reproduce
    the text-keyed result exactly on the fixture (no collisions, same
    per-doc distinct-gram counts)."""
    from alternating_least_squares_spark.registry import (
        q_t24_ngram_decontaminate,
        q_t25_hashed_decontaminate,
    )

    text_keyed = sorted(
        (r["doc_id"], r["n_shared"])
        for r in q_t24_ngram_decontaminate(spark, SF_SMALL).collect()
    )
    hash_keyed = sorted(
        (r["doc_id"], r["n_shared"])
        for r in q_t25_hashed_decontaminate(spark, SF_SMALL).collect()
    )
    assert text_keyed == hash_keyed
    assert text_keyed  # the fixture plants contamination; never empty


def test_q05_schema_drift_flags_planted_null_column(spark):
    """q05: a wave whose 'lang' column goes 50% NULL for one source
    must flag (source, lang) as drifted while other columns and
    sources stay quiet; organic wave/ref splits stay under the gate."""
    from unittest import mock

    import alternating_least_squares_spark.registry as R

    rows = []
    for source in ("srcA", "srcB"):
        for i in range(200):
            doc_id = i * 3 if i < 100 else (i - 100) * 3 + 1  # wave/ref
            # plant: srcA wave docs lose lang on every even i
            lang = (
                None
                if source == "srcA" and i < 100 and i % 2 == 0
                else "en"
            )
            rows.append(
                (doc_id + (0 if source == "srcA" else 3_000_000),
                 "body text", lang, source, 9)
            )
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    )
    real_load = R.load_table
    with mock.patch.object(
        R, "load_table",
        lambda sp, sf, name: batch
        if name == "documents" else real_load(sp, sf, name),
    ):
        got = {
            (r["source"], r["col_name"]): (
                r["wave_ppm"], r["ref_ppm"], r["delta_ppm"], r["drifted"]
            )
            for r in R.q_q05_schema_drift(spark, "ignored").collect()
        }
    # srcA ids: 100 wave (i*3 % 3 == 0), 100 ref; 50 wave langs NULL
    assert got[("srcA", "lang")] == (500_000, 0, 500_000, 1)
    assert got[("srcA", "text")] == (0, 0, 0, 0)
    assert got[("srcB", "lang")] == (0, 0, 0, 0)
    assert got[("srcB", "n_chars")] == (0, 0, 0, 0)


def test_t26_substring_dedup_hand_computed(spark, monkeypatch):
    """t26 on a corpus computable by hand (ids ≡ 0 mod 7 keep the
    registry's planting branches inert): a 60-token block shared
    mid-doc/at-0/by-an-exact-dup must yield exactly the three maximal
    span rows with the right starts and lengths; a 49-token overlap
    (one below threshold) and a windowless short doc yield nothing."""
    import alternating_least_squares_spark.registry as R
    from alternating_least_squares_spark.registry import queries

    shared = " ".join(f"s{i}" for i in range(60))
    sub49 = " ".join(f"s{i}" for i in range(49))
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"a{i}" for i in range(10)) + " " + shared),
            (7, shared + " " + " ".join(f"b{i}" for i in range(5))),
            (14, "c0 " + sub49 + " c1"),
            (21, " ".join(f"a{i}" for i in range(10)) + " " + shared),
            (28, "w0 w1 w2"),
        ],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    rows = {
        (r["doc_a"], r["doc_b"], r["a_start"], r["b_start"], r["span_tokens"])
        for r in queries()["t26_substring_dedup"](spark, "ignored").collect()
    }
    assert rows == {
        (0, 7, 10, 0, 60),    # mid-doc vs position 0
        (0, 21, 0, 0, 70),    # exact dup: the WHOLE doc is one span
        (7, 21, 0, 10, 60),
    }


def test_t26_planting_and_threshold(spark, monkeypatch):
    """The registry's own planted corpus: same-family %7==3 docs share
    exactly the 60-token paragraph (one span row, correct offsets);
    same-family %7==4 docs share only the 30-token snippet — below
    the 50-token threshold, so NO row (the sub-threshold pin VERDICT
    r16 #5 asks for); and the hot-gram cap kills pair fan-out when
    lowered beneath the family size."""
    import alternating_least_squares_spark.registry as R
    from alternating_least_squares_spark.registry import queries

    # 3 % 7 == 3, 16 % 7 == 2... use 3 and 94 (94%7==3, 94%13==3 ==
    # 3%13) for the para family; 4 and 95 (both %7==4, %13==4) for
    # the snippet family
    assert 94 % 7 == 3 and 94 % 13 == 3 % 13
    assert 95 % 7 == 4 and 95 % 13 == 4 % 13
    docs = spark.createDataFrame(
        [
            (3, " ".join(f"p{i}" for i in range(60))),
            (94, " ".join(f"q{i}" for i in range(20))),
            (4, " ".join(f"r{i}" for i in range(55))),
            (95, " ".join(f"u{i}" for i in range(25))),
        ],
        "doc_id long, text string",
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    rows = {
        (r["doc_a"], r["doc_b"], r["a_start"], r["b_start"], r["span_tokens"])
        for r in queries()["t26_substring_dedup"](spark, "ignored").collect()
    }
    assert rows == {(3, 94, 60, 20, 60)}
    # cap below the family size: the paragraph's windows are now "hot"
    # and excluded — no pairs at all
    monkeypatch.setattr(R, "T26_CAP", 1)
    assert queries()["t26_substring_dedup"](spark, "ignored").count() == 0


def test_t27_scrub_kills_spans_and_keeps_canonical(spark, monkeypatch):
    """VERDICT r17 #6: t27 scrubs each shared span from the HIGHER
    doc of the pair, token-exact. On the hand corpus: the canonical
    (lowest) doc survives byte-identical, scrubbed docs keep exactly
    their uncovered tokens, sub-threshold overlaps stay untouched —
    and a t26 re-run over the SCRUBBED corpus finds nothing ≥ the
    threshold."""
    import hashlib

    import alternating_least_squares_spark.registry as R
    from alternating_least_squares_spark.registry import queries

    shared = " ".join(f"s{i}" for i in range(60))
    sub49 = " ".join(f"s{i}" for i in range(49))
    texts = {
        0: " ".join(f"a{i}" for i in range(10)) + " " + shared,
        7: shared + " " + " ".join(f"b{i}" for i in range(5)),
        14: "c0 " + sub49 + " c1",
        21: " ".join(f"a{i}" for i in range(10)) + " " + shared,
        28: "w0 w1 w2",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    real_load = R.load_table
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs if name == "documents"
        else real_load(sp, sf, name),
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_md5"])
        for r in queries()["t27_span_scrub_pairs"](spark, "ignored").collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 0 is doc_a in every pair it joins: canonical, intact
    assert got[0] == (70, 70, md5(texts[0]))
    # doc 7 loses its 60-token shared prefix, keeps the b-tail
    assert got[7] == (65, 5, md5(" ".join(f"b{i}" for i in range(5))))
    # doc 21 is an exact dup of doc 0: the whole 70-token doc is the
    # shared span -> scrubbed to nothing
    assert got[21] == (70, 0, md5(""))
    # sub-threshold (49) and windowless docs untouched
    assert got[14] == (51, 51, md5(texts[14]))
    assert got[28] == (3, 3, md5(texts[28]))

    # the removal is COMPLETE: t26 over the scrubbed corpus is empty
    scrubbed_texts = {
        0: texts[0], 14: texts[14], 28: texts[28],
        7: " ".join(f"b{i}" for i in range(5)),
        21: "",
    }
    docs2 = spark.createDataFrame(
        list(scrubbed_texts.items()), "doc_id long, text string"
    )
    monkeypatch.setattr(
        R, "load_table",
        lambda sp, sf, name: docs2 if name == "documents"
        else real_load(sp, sf, name),
    )
    assert queries()["t26_substring_dedup"](spark, "ignored").count() == 0
