"""b6 shell-language front end: string queries -> Spark DataFrame plans.

The reference's interactive surface is a small expression language
(`find [#amenity=bench] | take 10`) parsed by a goyacc grammar
(reference: b6/api/shell.y:30-209, lexer shell.go:220-377) and evaluated
on a bytecode VM (b6/api/vm.go).  This package re-expresses that surface
Spark-first: the same grammar, parsed by a recursive-descent parser, is
COMPILED onto the engine's existing DataFrame operators -- lambdas over
feature collections become Column expressions (never per-row Python), and
queries become pushdown-able predicates from operators/find.py.
"""

from .parse import parse_expression, ParseError
from .evaluate import Env, evaluate_expression, run

__all__ = [
    "parse_expression",
    "ParseError",
    "Env",
    "evaluate_expression",
    "run",
]
