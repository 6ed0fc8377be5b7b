from .extract import extract_geo_points, with_z2_cell, with_z3_cell, grid_cell
from .joins import cover_cells_for_polys, spatial_join_points_in_polys, distance_join
from .knn import knn
from .tiles import density_grid, write_tiles

__all__ = [
    "extract_geo_points",
    "with_z2_cell",
    "with_z3_cell",
    "grid_cell",
    "cover_cells_for_polys",
    "spatial_join_points_in_polys",
    "distance_join",
    "knn",
    "density_grid",
    "write_tiles",
]
