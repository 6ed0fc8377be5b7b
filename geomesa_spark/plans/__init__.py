from .planner import z2_range_predicate, z3_range_predicate, bbox_predicate
from .ecql import (
    parse_ecql,
    compile_ecql,
    split_primary,
    plan_ecql,
    parse_expression,
    compile_expression,
    apply_transforms,
)

__all__ = [
    "z2_range_predicate",
    "z3_range_predicate",
    "bbox_predicate",
    "parse_ecql",
    "compile_ecql",
    "split_primary",
    "plan_ecql",
    "parse_expression",
    "compile_expression",
    "apply_transforms",
]
