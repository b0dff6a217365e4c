"""Dataset assembly: hash splits, stratified sampling, sequence packing."""

from __future__ import annotations

from docling_japanese_books_spark.operators.sampling import (
    hash_split,
    pack_chunks,
    pack_sequences,
    stratified_sample,
)


def test_hash_split_deterministic_and_proportional(spark):
    docs = spark.createDataFrame([(i,) for i in range(20_000)], "doc_id long")
    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    n = len(a)
    train = sum(1 for s in a.values() if s == "train") / n
    val = sum(1 for s in a.values() if s == "val") / n
    test = sum(1 for s in a.values() if s == "test") / n
    assert abs(train - 0.98) < 0.01 and abs(val - 0.01) < 0.005
    assert abs(test - 0.01) < 0.005
    assert train + val + test == 1.0


def test_hash_split_custom_weights(spark):
    docs = spark.createDataFrame([(i,) for i in range(10_000)], "doc_id long")
    out = hash_split(docs, weights={"a": 0.5, "b": 0.5})
    frac = out.filter("split = 'a'").count() / 10_000
    assert abs(frac - 0.5) < 0.03


def test_stratified_sample_subset_and_fractions(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(i,) for i in range(30_000)], "doc_id long")
    docs = docs.withColumn("stratum", (F.col("doc_id") % 2).cast("string"))
    kept = stratified_sample(docs, {"0": 0.25, "1": 1.0}, stratum_col="stratum")
    rows = kept.collect()
    n0 = sum(1 for r in rows if r.stratum == "0")
    n1 = sum(1 for r in rows if r.stratum == "1")
    assert n1 == 15_000  # fraction 1.0 keeps everything
    assert abs(n0 / 15_000 - 0.25) < 0.02
    # sample is a strict subset with original columns intact
    assert {r.doc_id for r in rows} <= set(range(30_000))


def test_pack_chunks_greedy_first_fit():
    texts = ["a b", "c d e", "f", "g h i j k"]
    counts = [2, 3, 1, 5]
    seqs = pack_chunks(texts, counts, budget=5)
    assert [(s["n_tokens"], s["n_chunks"]) for s in seqs] == [(5, 2), (1, 1), (5, 1)]
    assert seqs[0]["text"] == "a b\n\nc d e"
    # oversized single chunk becomes its own sequence, never split
    solo = pack_chunks(["one two three"], [3], budget=2)
    assert len(solo) == 1 and solo[0]["n_tokens"] == 3
    assert pack_chunks([], [], budget=8) == []


def test_pack_sequences_matches_core(spark):
    rows = [
        (1, 0, "alpha beta"),
        (1, 1, "gamma delta epsilon"),
        (1, 2, "zeta"),
        (2, 0, "solo"),
    ]
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_index long, text string")
    out = pack_sequences(chunks, budget=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    expect = pack_chunks(
        ["alpha beta", "gamma delta epsilon", "zeta"], [2, 3, 1], budget=4
    )
    got = sorted(by_doc[1], key=lambda r: r.seq_index)
    assert [(r.n_tokens, r.n_chunks, r.text) for r in got] == [
        (s["n_tokens"], s["n_chunks"], s["text"]) for s in expect
    ]
    assert by_doc[2][0].text == "solo"


def test_int8_quantization_roundtrip(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from docling_japanese_books_spark.operators.quantize import (
        dequantize_int8,
        int8_scale,
        quantize_binary,
        quantize_int8,
        reconstruction_mse,
    )

    vecs = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: no NaNs
        (3, [127.0, -127.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    scale = int8_scale(F.col("embedding"))
    out = df.select(
        "vec_id",
        scale.alias("s"),
        quantize_int8(F.col("embedding"), scale).alias("q"),
        reconstruction_mse(
            F.col("embedding"), dequantize_int8(quantize_int8(F.col("embedding"), scale), scale)
        ).alias("mse"),
        quantize_binary(F.col("embedding")).alias("b"),
    )
    rows = {r.vec_id: r for r in out.collect()}
    # numpy reference for vec 1
    v = np.array(vecs[0][1])
    s = np.abs(v).max() / 127.0
    q = np.round(v / s).astype(int)
    assert list(rows[1].q) == q.tolist()
    assert abs(rows[1].mse - ((v - q * s) ** 2).mean()) < 1e-9
    assert max(abs(x) for x in rows[1].q) <= 127
    # all-zero vector: quantizes to zeros with zero error
    assert list(rows[2].q) == [0, 0, 0, 0] and rows[2].mse == 0.0
    # sign quantization
    assert list(rows[1].b) == [1, 0, 1, 0]


# ---------------------------------------------------------------------------
# temperature mixing (operators/mixing.py)
# ---------------------------------------------------------------------------


def _domains_df(spark, sizes):
    rows = []
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, domain string")


def test_temperature_plan_flattens_toward_small_domains(spark):
    from docling_japanese_books_spark.operators.mixing import (
        temperature_mix_plan,
    )

    df = _domains_df(spark, {"big.example": 400, "small.example": 25})
    plan = {
        r.domain: r
        for r in temperature_mix_plan(
            df, "domain", alpha=0.5, target_total=100
        ).collect()
    }
    big, small = plan["big.example"], plan["small.example"]
    # sqrt smoothing: weights 20/25 and 5/25
    assert abs(big.weight - 0.8) < 1e-12 and abs(small.weight - 0.2) < 1e-12
    # natural shares are 400/425 vs 25/425: the small domain's share rose
    assert small.weight > 25 / 425 and big.weight < 400 / 425
    assert abs(big.keep_prob - 100 * 0.8 / 400) < 1e-12
    assert abs(small.keep_prob - 100 * 0.2 / 25) < 1e-12


def test_temperature_plan_saturates_at_one(spark):
    from docling_japanese_books_spark.operators.mixing import (
        temperature_mix_plan,
    )

    # a tiny domain whose boosted share exceeds its size: capped at 1.0
    df = _domains_df(spark, {"big.example": 900, "tiny.example": 4})
    plan = {
        r.domain: r.keep_prob
        for r in temperature_mix_plan(
            df, "domain", alpha=0.5, target_total=800
        ).collect()
    }
    assert plan["tiny.example"] == 1.0
    assert plan["big.example"] < 1.0


def test_temperature_mix_deterministic_and_alpha_one_is_natural(spark):
    from docling_japanese_books_spark.operators.mixing import (
        temperature_mix,
        temperature_mix_plan,
    )

    df = _domains_df(spark, {"a.example": 300, "b.example": 100})
    kept1 = sorted(
        r.doc_id for r in temperature_mix(df, "domain", 0.5, 200).collect()
    )
    kept2 = sorted(
        r.doc_id
        for r in temperature_mix(
            df.repartition(7), "domain", 0.5, 200
        ).collect()
    )
    assert kept1 == kept2 and len(kept1) > 0  # id-deterministic, layout-free
    # alpha=1 keeps the natural distribution: keep_prob identical everywhere
    plan = {
        r.domain: r.keep_prob
        for r in temperature_mix_plan(
            df, "domain", alpha=1.0, target_total=200
        ).collect()
    }
    assert abs(plan["a.example"] - plan["b.example"]) < 1e-12
    assert abs(plan["a.example"] - 0.5) < 1e-12  # 200 of 400
