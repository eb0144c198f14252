"""Query suite — the driver-facing registry (``__spark_entry__.py`` contract).

Each domain module contributes ``QUERIES: dict[str, Query]``; this package
merges them. Every operator from SURVEY.md §2 (plus the BASELINE.json
extension operators) has exactly one named entry here, with a DuckDB
oracle twin where SQL-expressible.
"""

from __future__ import annotations

from .base import Query
from . import (
    curation,
    dedup,
    events,
    graph,
    joins2,
    maps,
    multimodal,
    parity,
    relational,
    scalars2,
    similarity,
    stats,
    text,
    udfs,
)


# The external driver canonicality-checks queries() in registry order with a
# bounded window (round 1: first 50 of 104). Round 1 checked the relational/
# stats/parity head and left all 54 LLM-pipeline queries unverified, so the
# registry now front-loads those (pipeline, dedup, similarity, text, events,
# udfs, maps, multimodal, subqueries, sampling); the 50 queries already
# driver-green in CORRECTNESS_r01.json rotate to the tail.
DRIVER_PRIORITY: tuple[str, ...] = (
    "pipeline_curation",
    "dedup_exact",
    "dedup_keep_first",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_cosine_topk",
    "similarity_cosine_pairs",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "embedding_norms",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_winnow_fingerprint",
    "text_repetition_score",
    "text_top_bigrams",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_hypertable_rollup",
    "events_gap_fill",
    "events_click_attribution",
    "events_recursive_chains",
    "events_json_extract",
    "events_variant_extract",
    "events_type_stats",
    "udaf_geomean",
    "grouped_map_centroids",
    "udtf_sentences",
    "map_functions",
    "struct_functions",
    "multimodal_metadata",
    "multimodal_typed_metadata",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    "multimodal_decode",
    "multimodal_audio_decode",
    "multimodal_frame_sample",
    "scalar_subquery",
    "in_subquery",
    "exists_subquery",
    "not_exists_subquery",
    "conditional_functions",
    "sample_deterministic",
    "sample_stratified",
    # window boundary — below here sat past slot 50 in round 2
    "decontaminate",
    "pii_redact",
    "quota_sample",
    "sequence_pack",
    "tfidf_top_terms",
    "train_shuffle",
    "sample_weighted",
    "multimodal_resize",
    "multimodal_features",
    "unpivot",
    "union_by_name",
    "explode_tokens",
    "sample_rng",
    # round-2 late additions — rotate into the window in later rounds
    "graph_pagerank",
    "dedup_fuzzy_levenshtein",
    "events_funnel",
    "quality_outliers",
    "domain_mix_report",
    "text_unigram_logprob",
    "similarity_knn_join",
    "events_transition_matrix",
    "events_retention",
    "join_nation_volume",
    "join_returned_customers",
    "market_basket",
    "approx_distinct_rollup",
)


def all_queries() -> dict[str, Query]:
    merged: dict[str, Query] = {}
    for mod in (
        parity,
        curation,
        graph,
        relational,
        joins2,
        stats,
        scalars2,
        maps,
        events,
        text,
        dedup,
        similarity,
        multimodal,
        udfs,
    ):
        for name, q in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = q
    missing = [n for n in DRIVER_PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names not in registry: {missing}")
    ordered: dict[str, Query] = {n: merged[n] for n in DRIVER_PRIORITY}
    for name, q in merged.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


__all__ = ["Query", "all_queries"]
