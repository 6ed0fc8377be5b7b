from .planner import z2_range_predicate, z3_range_predicate, bbox_predicate

__all__ = ["z2_range_predicate", "z3_range_predicate", "bbox_predicate"]
