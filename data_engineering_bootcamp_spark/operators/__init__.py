from .cumulate import cumulate_datelist
from .scd import scd_from_snapshots, scd_incremental
from .dedup import (
    dedup_exact,
    dedup_keep_first,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from .growth import growth_accounting, retention_curve
from .funnel import funnel_conversion
from .graph import build_edges_pairs, build_vertices
from .similarity import cosine_topk_bruteforce, cosine_topk_lsh

__all__ = [
    "cumulate_datelist",
    "scd_from_snapshots",
    "scd_incremental",
    "dedup_exact",
    "dedup_keep_first",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "growth_accounting",
    "retention_curve",
    "funnel_conversion",
    "build_vertices",
    "build_edges_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
]
