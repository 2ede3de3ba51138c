"""Large-scale training-data pipeline operators (brief extension beyond
the reference surface): dedup + duplicate-cluster resolution, similarity
search (brute force / hyperplane LSH / IVF), deterministic sampling &
train/val/test splits, sequence packing, text analysis & quality
filters, multimodal columns. All hot paths are built-in Column
expressions (JVM-side); Python appears only in Arrow-batched
mapInPandas (multimodal decode stubs, exact greedy packing)."""

from jetro_spark.llm.dedup import (
    connected_components,
    dedup_near_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from jetro_spark.llm.chunking import split_by_tokens
from jetro_spark.llm.text import (
    decontaminate,
    ngram_overlap_flags,
    c4_rules,
    dup_ngram_char_mass,
    gopher_rules,
    line_stats,
    top_ngram_char_mass,
)
from jetro_spark.llm.packing import pack_by_cumsum, pack_greedy
from jetro_spark.llm.sampling import (
    hash_sample,
    hash_split,
    mixture_interleave,
    stratified_hash_sample,
)
from jetro_spark.llm.similarity import (
    brute_force_topk,
    int8_dequantize,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
    int8_quantize,
    l2_normalize,
    hyperplane_lsh_topk,
    ivf_topk,
    label_centroids,
)

__all__ = [
    "split_by_tokens",
    "gopher_rules",
    "ngram_overlap_flags",
    "decontaminate",
    "c4_rules",
    "line_stats",
    "top_ngram_char_mass",
    "dup_ngram_char_mass",
    "mixture_interleave",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "connected_components",
    "dedup_near_clusters",
    "brute_force_topk",
    "l2_normalize",
    "int8_quantize",
    "int8_dequantize",
    "train_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "hyperplane_lsh_topk",
    "ivf_topk",
    "label_centroids",
    "hash_split",
    "hash_sample",
    "stratified_hash_sample",
    "pack_by_cumsum",
    "pack_greedy",
]
