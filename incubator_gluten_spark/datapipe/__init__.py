"""LLM training-data pipeline operators.

The reference engine (a SQL-offload layer) has none of these; they are the
extension surface a 100 TB training-data pipeline needs, built Spark-first:

  dedup.py       exact + MinHash-LSH + SimHash near-duplicate detection
  similarity.py  cosine kernels, brute-force and LSH-bucketed ANN
  textstats.py   token counts, quality scoring, language-ID, fingerprints
  multimodal.py  binary payload columns + Arrow-batched decode plumbing

Scale discipline shared by all of them: candidate generation is always
*blocked* (LSH band buckets, label/lang blocks) so no operator ever does an
all-pairs cross join; per-document work is a linear scan expressed with
JVM-side higher-order functions; Python only touches data through
Arrow-batched mapInPandas where a kernel genuinely needs it.
"""

from incubator_gluten_spark.datapipe.dedup import (
    connected_components,
    exact_dedup,
    minhash_near_dup_pairs,
    normalize_text,
    simhash,
    simhash_near_dup_pairs,
    token_shingles,
)
from incubator_gluten_spark.datapipe.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_similarity,
    embedding_near_dup_pairs,
    exact_near_dup_pairs,
    lsh_params_for,
)
from incubator_gluten_spark.datapipe.textstats import (
    fingerprint,
    lang_id,
    scrub_pii,
    text_quality,
    text_stats,
    token_count_bpe,
)

__all__ = [
    "normalize_text",
    "exact_dedup",
    "token_shingles",
    "minhash_near_dup_pairs",
    "simhash",
    "cosine_similarity",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "connected_components",
    "simhash_near_dup_pairs",
    "scrub_pii",
    "token_count_bpe",
    "embedding_near_dup_pairs",
    "exact_near_dup_pairs",
    "lsh_params_for",
    "text_stats",
    "text_quality",
    "lang_id",
    "fingerprint",
]
