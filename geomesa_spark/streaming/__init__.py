from .live import (
    continuous_query,
    latest_state,
    parse_feature_stream,
    persist_tick,
    rate_features,
    track_state,
    windowed_density,
    with_cell_key,
)

__all__ = [
    "rate_features", "parse_feature_stream", "latest_state", "with_cell_key",
    "continuous_query", "windowed_density", "track_state", "persist_tick",
]
