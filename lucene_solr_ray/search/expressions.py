"""Score-shaping expression compiler (the reference's `expressions` module,
expressions/js/JavascriptCompiler.java:77 role).

The reference compiles a JavaScript arithmetic expression to bytecode bound
to ValueSources; here a restricted Python arithmetic expression is compiled
(via the `ast` module, whitelisted node types only — no attribute access, no
subscripts, no arbitrary calls) to a closure over numpy arrays. Variables
resolve to per-hit columns: `score` (the wrapped query's score), `doclen`,
and any NUMERIC docvalues field of the index.
"""

from __future__ import annotations

import ast

import numpy as np

_FUNCS = {
    "log": np.log,
    "log1p": np.log1p,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
}


def compile_expression(src: str):
    """Compile an arithmetic expression -> fn(env: dict[str, ndarray]) ->
    float64 ndarray. Raises ValueError on any disallowed construct."""
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"bad expression {src!r}: {e}") from None

    names: set[str] = set()

    def check(node) -> None:
        if isinstance(node, ast.Expression):
            check(node.body)
        elif isinstance(node, ast.BinOp):
            if type(node.op) not in _BINOPS:
                raise ValueError(f"operator {type(node.op).__name__} not allowed")
            check(node.left)
            check(node.right)
        elif isinstance(node, ast.UnaryOp):
            if not isinstance(node.op, (ast.USub, ast.UAdd)):
                raise ValueError("only unary +/- allowed")
            check(node.operand)
        elif isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(f"function not allowed in {src!r}")
            if node.keywords:
                raise ValueError("keyword arguments not allowed")
            for a in node.args:
                check(a)
        elif isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError("only numeric constants allowed")
        else:
            raise ValueError(f"{type(node).__name__} not allowed in expressions")

    check(tree)

    def ev(node, env):
        if isinstance(node, ast.Expression):
            return ev(node.body, env)
        if isinstance(node, ast.BinOp):
            return _BINOPS[type(node.op)](ev(node.left, env), ev(node.right, env))
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand, env)
            return -v if isinstance(node.op, ast.USub) else v
        if isinstance(node, ast.Call):
            return _FUNCS[node.func.id](*(ev(a, env) for a in node.args))
        if isinstance(node, ast.Name):
            if node.id not in env:
                raise KeyError(f"unknown variable {node.id!r}")
            return env[node.id]
        if isinstance(node, ast.Constant):
            return float(node.value)
        raise AssertionError

    def fn(env: dict) -> np.ndarray:
        out = ev(tree, env)
        return np.asarray(out, dtype=np.float64)

    fn.variables = frozenset(names)  # type: ignore[attr-defined]
    return fn
