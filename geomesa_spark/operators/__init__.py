from .ann import cosine_topk, lsh_cosine_topk, with_lsh_bucket
from .dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    with_minhash,
    with_simhash,
)
from .extract import (
    extract_geo_points,
    grid_cell,
    with_xz2_cell,
    with_xz3_cell,
    with_z2_cell,
    with_z3_cell,
)
from .joins import (
    attribute_join,
    cover_cells_for_polys,
    distance_join,
    spatial_join_points_in_polys,
    tube_select,
)
from .knn import knn
from .multimodal import decode_image, extract_media_refs, image_features, load_media
from .stats import run_stats_dsl
from .text import with_fingerprint, with_language_id, with_quality_score, with_token_stats
from .tiles import density_grid, tile_pyramid, write_tiles

__all__ = [
    "extract_geo_points", "with_z2_cell", "with_z3_cell", "with_xz2_cell",
    "with_xz3_cell", "grid_cell",
    "cover_cells_for_polys", "spatial_join_points_in_polys", "distance_join",
    "tube_select", "attribute_join", "knn",
    "density_grid", "tile_pyramid", "write_tiles",
    "run_stats_dsl",
    "exact_dedup", "with_minhash", "lsh_candidate_pairs", "with_simhash",
    "ngram_jaccard_pairs",
    "with_token_stats", "with_language_id", "with_quality_score", "with_fingerprint",
    "cosine_topk", "lsh_cosine_topk", "with_lsh_bucket",
    "extract_media_refs", "load_media", "decode_image", "image_features",
]
