"""Query-plan layer: the triple-pattern (BGP) compiler."""

from .bgp import Var, compile_bgp, triples_view  # noqa: F401
