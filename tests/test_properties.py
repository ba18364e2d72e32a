"""Property-based invariants (hypothesis) for the matrix operators:
algebraic laws that must hold for ANY input, not just the literal
fixtures. Example counts are kept small — each example is a real
Spark job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from alternating_least_squares_spark.operators import matrix as M

SETTINGS = settings(max_examples=5, deadline=None)

pos_matrix = st.lists(
    st.lists(
        st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
        min_size=2,
        max_size=4,
    ),
    min_size=2,
    max_size=4,
).filter(lambda rows: len({len(r) for r in rows}) == 1)


def _to_df(spark, rows):
    data = [
        (r, c, float(v)) for r, row in enumerate(rows) for c, v in enumerate(row)
    ]
    return spark.createDataFrame(data, "r long, c long, v double")


@SETTINGS
@given(rows=pos_matrix)
def test_transpose_is_involutive(spark, rows):
    m = _to_df(spark, rows)
    twice = M.transpose(M.transpose(m))
    assert {(r["r"], r["c"], r["v"]) for r in twice.collect()} == {
        (r["r"], r["c"], r["v"]) for r in m.collect()
    }


@SETTINGS
@given(rows=pos_matrix)
def test_weight_matrix_rows_sum_to_one(spark, rows):
    w = M.sum_rows(M.weight_matrix(_to_df(spark, rows)))
    assert all(abs(r["v"] - 1.0) < 1e-9 for r in w.collect())


@SETTINGS
@given(rows=pos_matrix)
def test_transpose_swaps_row_and_col_sums(spark, rows):
    m = _to_df(spark, rows)
    rs = {r["id"]: r["v"] for r in M.sum_rows(m).collect()}
    cs_t = {r["id"]: r["v"] for r in M.sum_cols(M.transpose(m)).collect()}
    assert rs == cs_t


@SETTINGS
@given(rows=pos_matrix)
def test_optimize_marginal_hits_target_rows(spark, rows):
    """The defining row-pass property for arbitrary positive matrices:
    after fitting, row sums equal the target marginal."""
    m = _to_df(spark, rows)
    target = [(i, float(10 + 3 * i)) for i in range(len(rows))]
    marg = spark.createDataFrame(target, "id long, v double")
    fitted = M.optimize_marginal(marg, m)
    got = {r["id"]: r["v"] for r in M.sum_rows(fitted).collect()}
    assert all(abs(got[i] - v) < 1e-8 for i, v in target)


# --- textfns flat-expression rewrites vs their array-based definitions ---
# token_count/avg_token_length/punct_count were rewritten from
# split+size / aggregate-lambda / regexp forms into flat codegen
# expressions (regexp_count runs, translate length deltas). These
# properties pin the rewrites to the definitional forms for arbitrary
# whitespace-laden text, including the NULL/empty/only-whitespace
# edges the oracle data never exercises.

texts = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=" \t\n\x0b\x0c\rabcXYZ.,!?;:'0123456789",
            max_size=60,
        ),
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(batch=texts)
def test_token_count_matches_definitional_split(spark, batch):
    from pyspark.sql import functions as F

    from alternating_least_squares_spark.functions import textfns as TX

    df = spark.createDataFrame([(t,) for t in batch], "text string")
    rows = df.select(
        TX.token_count(F.col("text")).alias("fast"),
        F.size(TX.tokens(F.col("text"))).alias("def_"),
    ).collect()
    assert all(r["fast"] == r["def_"] for r in rows), rows


@SETTINGS
@given(batch=texts)
def test_avg_token_length_matches_lambda_aggregate(spark, batch):
    from pyspark.sql import functions as F

    from alternating_least_squares_spark.functions import textfns as TX

    df = spark.createDataFrame([(t,) for t in batch], "text string")
    toks = TX.tokens(F.col("text"))
    definitional = F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x))
        / F.size(toks)
    )
    rows = df.select(
        TX.avg_token_length(F.col("text")).alias("fast"),
        definitional.alias("def_"),
    ).collect()
    assert all(abs(r["fast"] - r["def_"]) < 1e-12 for r in rows), rows


@SETTINGS
@given(batch=texts)
def test_punct_count_matches_regexp(spark, batch):
    from pyspark.sql import functions as F

    from alternating_least_squares_spark.functions import textfns as TX

    df = spark.createDataFrame([(t,) for t in batch], "text string")
    rows = df.select(
        TX.punct_count(F.col("text")).alias("fast"),
        F.regexp_count("text", F.lit(TX.PUNCT_CLASS)).alias("def_"),
    ).collect()
    assert all(r["fast"] == r["def_"] for r in rows), rows


@given(
    sets=st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdefg"), max_size=6),
            st.lists(st.sampled_from("abcdefg"), max_size=6),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None)
def test_containment_dominates_jaccard(spark, sets):
    """∀ A,B: J(A,B) ≤ C(A,B) (|∪| ≥ |A|) and C is 1.0 exactly when
    A ⊆ B (non-empty) — the algebra d08's excerpt detection relies on."""
    from pyspark.sql import functions as F

    from alternating_least_squares_spark.functions.dedup import (
        containment,
        jaccard,
    )

    rows = [(list(set(a)), list(set(b))) for a, b in sets]
    df = spark.createDataFrame(rows, "a array<string>, b array<string>")
    got = df.select(
        jaccard(F.col("a"), F.col("b")).alias("j"),
        containment(F.col("a"), F.col("b")).alias("c"),
        F.size(F.array_except(F.col("a"), F.col("b"))).alias("a_minus_b"),
        F.size("a").alias("na"),
    ).collect()
    for r in got:
        assert r["j"] <= r["c"] + 1e-12
        if r["na"] > 0:
            assert (r["c"] == 1.0) == (r["a_minus_b"] == 0)


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=256,
    ),
    rate=st.integers(min_value=1, max_value=192_000),
)
@settings(max_examples=200, deadline=None)
def test_wav_container_roundtrip_property(samples, rate):
    """Any int16 sample vector at any positive rate survives the
    RIFF/WAVE encode → decode round trip bit-exactly (pure Python —
    no Spark)."""
    import struct as _struct

    from alternating_least_squares_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    pcm = _struct.pack(f"<{len(samples)}h", *samples)
    got_rate, got_pcm = decode_wav(encode_wav(pcm, rate))
    assert (got_rate, got_pcm) == (rate, pcm)


@given(blob=st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_wav_decoder_never_crashes_on_junk(blob):
    """Arbitrary bytes either parse as a valid container or raise
    ValueError — never an unhandled struct.error/IndexError, never a
    hang (the decoder is fed crawl bytes at scale; crash class
    matters as much as correctness)."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_wav,
    )

    try:
        rate, pcm = decode_wav(blob)
    except ValueError:
        return
    assert rate > 0 and len(pcm) % 2 == 0


@given(blob=st.binary(min_size=0, max_size=120))
@settings(max_examples=300, deadline=None)
def test_bmp_decoder_never_crashes_on_junk(blob):
    """Arbitrary bytes either decode as a valid BMP or raise
    ValueError — the same crash-class contract as the WAV decoder
    (struct.error/IndexError escaping the parser would kill whole
    Arrow batches at scale)."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_bmp,
    )

    try:
        w, h, px = decode_bmp(blob)
    except ValueError:
        return
    assert w > 0 and h > 0 and len(px) == w * h * 3
