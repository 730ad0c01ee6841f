"""The seafan expression language, compiled to PySpark Columns.

Reference pipeline: Expr2Tree (parse) -> Evaluate (eager row-at-a-time) ->
AddToPipe (parser.go:200-268, 1589-1629, 1703-1758). Here the same grammar
parses to an AST which COMPILES to an unevaluated ``pyspark.sql.Column``
tree — nothing executes until an action, and Catalyst folds constants,
prunes columns and pipelines the whole expression into whole-stage codegen.

Grammar (parser.go:44-59, 474-503; precedence loosest-first):
``&& ||``  ->  ``> >= < <= == !=``  ->  ``+ -``  ->  ``* /``  ->  ``^``;
parentheses; unary minus binding between ``+ -`` and ``* /`` (so ``-D*3``
is ``-(D*3)``); single-quoted string/date literals (``CCYYMMDD`` or
``M/D/CCYY``); bare numbers are float64 constants.

Semantics preserved (SURVEY §2.8): comparisons and logicals return float
0/1; ``if(cond,a,b)`` tests cond>0; arithmetic on strings/dates errors at
compile time; division by zero errors at run time (ANSI mode); summary
functions broadcast their scalar over rows (optionally per partition-key
group — our scale generalization the reference lacks).
"""

from seafan_spark.exprlang.compiler import CompileError, compile_expression, evaluate
from seafan_spark.exprlang.parser import Node, ParseError, parse
from seafan_spark.exprlang.pipe_ops import add_to_pipe, loop

__all__ = [
    "parse",
    "Node",
    "ParseError",
    "compile_expression",
    "evaluate",
    "CompileError",
    "add_to_pipe",
    "loop",
]
