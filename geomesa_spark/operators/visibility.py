"""P9 visibility filtering: per-row security labels evaluated against a
caller's authorizations.

Reference: GeoMesa stores Accumulo-style column visibilities per
feature (geomesa-security/.../security/VisibilityEvaluator.scala and
SecurityUtils.FEATURE_VISIBILITY) and filters rows whose boolean label
expression — e.g. ``admin|(user&internal)`` — is not satisfied by the
scanning user's auth set. Public expression grammar (Accumulo docs):

    expr   := term ('|' term)*
    term   := factor ('&' factor)*
    factor := label | '(' expr ')'

with ``&`` binding tighter than ``|``; an EMPTY visibility means the
row is visible to everyone.

Spark-first: visibility strings have tiny cardinality relative to row
count (a handful of label policies across billions of rows), so the
filter is a pandas UDF that parses/evaluates once per DISTINCT
expression per batch and maps the result — Arrow-vectorized, no
per-row Python. For the common single-label / conjunction-only cases
callers can also precompute a boolean column with pure ``array``
built-ins, but the UDF covers the full grammar.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["parse_visibility", "evaluate_visibility", "visible_col", "filter_by_auths"]


class _Tok:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str | None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1
        return self.s[self.i] if self.i < len(self.s) else None

    def take(self) -> str:
        c = self.peek()
        self.i += 1
        return c

    def label(self) -> str:
        self.peek()  # skip ws
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] in "_-.:/"):
            j += 1
        if j == self.i:
            raise ValueError(f"bad visibility at {self.i}: {self.s!r}")
        out = self.s[self.i : j]
        self.i = j
        return out


def parse_visibility(expr: str):
    """Parse to a nested tuple AST: ('or', [...]) / ('and', [...]) /
    ('label', name)."""
    t = _Tok(expr)

    def p_expr():
        terms = [p_term()]
        while t.peek() == "|":
            t.take()
            terms.append(p_term())
        return terms[0] if len(terms) == 1 else ("or", terms)

    def p_term():
        factors = [p_factor()]
        while t.peek() == "&":
            t.take()
            factors.append(p_factor())
        return factors[0] if len(factors) == 1 else ("and", factors)

    def p_factor():
        if t.peek() == "(":
            t.take()
            inner = p_expr()
            if t.peek() != ")":
                raise ValueError(f"unbalanced parens: {expr!r}")
            t.take()
            return inner
        return ("label", t.label())

    ast = p_expr()
    if t.peek() is not None:
        raise ValueError(f"trailing input in visibility: {expr!r}")
    return ast


def evaluate_visibility(expr: str | None, auths: frozenset[str]) -> bool:
    """True when the auth set satisfies the expression (empty/None
    visibility → visible to everyone, Accumulo semantics)."""
    if expr is None or expr.strip() == "":
        return True

    def ev(node) -> bool:
        kind = node[0]
        if kind == "label":
            return node[1] in auths
        if kind == "and":
            return all(ev(n) for n in node[1])
        return any(ev(n) for n in node[1])

    return ev(parse_visibility(expr))


def visible_col(vis_col: str | Column, auths) -> Column:
    """Boolean Column: row visible under ``auths``. Parses once per
    distinct expression per Arrow batch."""
    aset = frozenset(auths)

    @F.pandas_udf(T.BooleanType())
    def udf(v: pd.Series) -> pd.Series:
        def check(expr) -> bool:
            try:
                return evaluate_visibility(expr, aset)
            except ValueError:
                return False  # malformed labels hide the row (fail closed)

        uniq = {x: check(x) for x in v.unique()}
        return v.map(uniq).fillna(check(None)).astype(bool)

    return udf(F.col(vis_col) if isinstance(vis_col, str) else vis_col)


def filter_by_auths(df: DataFrame, auths, vis_col: str = "visibility") -> DataFrame:
    """Rows whose visibility expression the auth set satisfies
    (reference: VisibilityFilter wrapping every scan)."""
    return df.where(visible_col(vis_col, auths))
