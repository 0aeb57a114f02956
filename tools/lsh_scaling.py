"""Empirically validate the LSH sizing law (round-6 verdict directive #4).

The claim under test (similarity.py `lsh_params_for` docstring): with a
FIXED band width r, banded hyperplane LSH produces Theta(n^2) candidate
pairs — only the constant shrinks — while growing r with the corpus
(r ~ log2(n / target_bucket)) keeps buckets sparse and recovers the
sub-quadratic n^(1+rho) bound.

Method: tile the fixture embedding vectors up to n in {1k, 8k, 64k}
(×8 growth steps), decorrelating every copy with a copy-specific
Rademacher sign pattern (xxhash64-derived, deterministic) — sign-flipped
copies of a vector are uncorrelated with the original and with other
copies, so the tiled corpus behaves like a fresh isotropic sample of
size n, exactly what the random-collision term depends on.  For each n,
band the corpus twice:

* ADAPTIVE: (b, r) = lsh_params_for(0.85, 1e-9, n_rows=n, target_bucket=1)
* FIXED:    same miss target but r pinned at 3 (the fixture default)

and count candidate pairs = sum over (band, sig) buckets of C(m, 2) —
the exact number of pair comparisons the verify stage would perform.
Prints one JSON line per (n, mode) with the candidates/n ratio; the
measured curve is recorded in SCALE.md.

Usage: python3 tools/lsh_scaling.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def tiled_corpus(spark, sf_dir: str, n: int):
    """n decorrelated vectors: fixture embeddings tiled with per-copy
    Rademacher sign flips (deterministic, JVM-side)."""
    from incubator_gluten_spark.catalog import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base_n = emb.count()
    copies = (n + base_n - 1) // base_n
    tiled = emb.crossJoin(
        spark.range(copies).select(F.col("id").alias("copy"))
    ).select(
        (F.col("vec_id") + F.col("copy") * base_n).alias("id"),
        F.expr(
            "transform(v, (x, i) -> CASE WHEN xxhash64(copy, i) % 2 = 0 "
            "THEN x ELSE -x END)"
        ).alias("v"),
        "copy",
    )
    # spread the tiled corpus across the cores: the base fixture is one
    # parquet partition and crossJoin preserves it, so without this the
    # n=512k hash/count stages run in a SINGLE task
    return tiled.filter(F.col("id") < n).select("id", "v").repartition(64)


def candidate_pairs(spark, corpus, bands: int, band_bits: int) -> int:
    """Sum over (band, sig) buckets of C(m, 2) — the verify-stage pair
    count the banding would generate."""
    from incubator_gluten_spark.datapipe.similarity import band_sigs_kernel

    sigs = corpus.select(
        F.posexplode(band_sigs_kernel(bands, band_bits)(F.col("v"))).alias(
            "band", "sig"
        )
    )
    row = (
        sigs.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(row.pairs or 0)


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    sizes = (1000, 8000, 64000)
    if "--sizes" in sys.argv:  # e.g. --sizes 512000 (r8: third growth step)
        sizes = tuple(
            int(s) for s in sys.argv[sys.argv.index("--sizes") + 1].split(",")
        )

    from incubator_gluten_spark.datapipe.similarity import lsh_params_for
    from incubator_gluten_spark.session import get_session

    spark = get_session(app_name="lsh-scaling")
    out = []
    for n in sizes:
        corpus = tiled_corpus(spark, sf_dir, n).cache()
        corpus.count()
        for mode in ("adaptive", "fixed_r3"):
            if mode == "adaptive":
                b, r = lsh_params_for(0.85, 1e-9, n_rows=n, target_bucket=1)
            else:
                b, r = lsh_params_for(0.85, 1e-9)  # r defaults to 3
            pairs = candidate_pairs(spark, corpus, b, r)
            rec = {
                "n": n,
                "mode": mode,
                "bands": b,
                "band_bits": r,
                "candidate_pairs": pairs,
                "pairs_per_row": round(pairs / n, 1),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        corpus.unpersist()
    # growth factors between successive sizes (quadratic would be 64x
    # per 8x n; linear is 8x)
    for mode in ("adaptive", "fixed_r3"):
        seq = [r for r in out if r["mode"] == mode]
        growth = [
            round(b["candidate_pairs"] / max(a["candidate_pairs"], 1), 1)
            for a, b in zip(seq, seq[1:])
        ]
        print(json.dumps({"mode": mode, "growth_per_8x_n": growth}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
