from .asof import asof_join
from .components import connected_components
from .dedup import (
    content_hash,
    content_hash_dedup,
    exact_dedup,
    hamming64,
    minhash_lsh_candidates,
    minhash_signature,
    minhash_signatures_df,
    shingle_pairs_jaccard,
    simhash_df,
)
from .ivm import (
    agg_deltas,
    apply_deltas,
    apply_distinct,
    apply_minmax,
    compute_agg,
    compute_minmax,
    compute_stats,
    derive_stats,
    stats_deltas,
)
from .pca import pca_fit, pca_project
from .ranks import global_ntile, global_percent_rank, global_prefix_sum, global_row_number
from .similarity import arrow_cosine_topk, cosine_topk, ivf_topk, lsh_topk, nearest_neighbor_join
from .skew import (
    auto_salt_factor,
    auto_salted_join,
    bucketed_table,
    key_skew_profile,
    salted_join,
    write_bucketed,
)
from .topk import top_k, top_k_per_group
from .windows import session_window_agg, sliding_window_agg, tumbling_window_agg

__all__ = [
    "agg_deltas",
    "apply_deltas",
    "apply_distinct",
    "apply_minmax",
    "arrow_cosine_topk",
    "asof_join",
    "auto_salt_factor",
    "auto_salted_join",
    "key_skew_profile",
    "bucketed_table",
    "connected_components",
    "content_hash",
    "compute_agg",
    "compute_minmax",
    "compute_stats",
    "derive_stats",
    "stats_deltas",
    "content_hash_dedup",
    "cosine_topk",
    "exact_dedup",
    "global_ntile",
    "global_percent_rank",
    "global_prefix_sum",
    "global_row_number",
    "ivf_topk",
    "hamming64",
    "lsh_topk",
    "minhash_lsh_candidates",
    "minhash_signature",
    "minhash_signatures_df",
    "nearest_neighbor_join",
    "pca_fit",
    "pca_project",
    "salted_join",
    "session_window_agg",
    "shingle_pairs_jaccard",
    "simhash_df",
    "sliding_window_agg",
    "top_k",
    "top_k_per_group",
    "tumbling_window_agg",
    "write_bucketed",
]
