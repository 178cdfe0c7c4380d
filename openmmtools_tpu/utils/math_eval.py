"""Safe mathematical expression evaluation over an AST whitelist.

Behavioral analog of the reference ``math_eval`` (utils/utils.py:238) and
``sanitize_expression`` (utils/utils.py:196): evaluate a string expression of
named variables using only whitelisted operators/functions, including the
Heaviside ``step(x)`` used by alchemical lambda functions. Values may be
Python floats or JAX tracers — all operations are plain arithmetic or jnp
functions, so expressions stay differentiable/jittable when fed tracers.
"""
from __future__ import annotations

import ast
import operator
from typing import Any, Dict, Mapping

import jax.numpy as jnp

_UNARY_OPS = {
    ast.UAdd: operator.pos,
    ast.USub: operator.neg,
}

_BINARY_OPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Pow: operator.pow,
    ast.Mod: operator.mod,
    # reference utils.py:280-282: & | (and the keywords and/or) operate
    # BITWISE — on set-valued variables they are intersection/union
    ast.BitAnd: operator.and_,
    ast.BitOr: operator.or_,
}

_BOOL_OPS = {
    ast.And: operator.and_,
    ast.Or: operator.or_,
}

_COMPARE_OPS = {
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
}


def _step(x):
    """Heaviside step: 1 if x >= 0 else 0 (reference utils.py:262-266)."""
    return jnp.where(jnp.asarray(x) >= 0, 1.0, 0.0)


def _step_hm(x):
    """Heaviside with half-maximum convention step_hm(0) = 0.5."""
    x = jnp.asarray(x)
    return jnp.where(x > 0, 1.0, jnp.where(x < 0, 0.0, 0.5))


_FUNCTIONS: Dict[str, Any] = {
    "step": _step,
    "step_hm": _step_hm,
    "sign": jnp.sign,
    "sqrt": jnp.sqrt,
    "exp": jnp.exp,
    "log": jnp.log,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    # the reference resolves any math-module name (utils.py:319); cover the
    # commonly-used inverse/hyperbolic set with their jnp (traceable) forms
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "tanh": jnp.tanh,
    "abs": jnp.abs,
    "min": lambda *a: jnp.minimum.reduce(list(map(jnp.asarray, a))) if len(a) > 2 else jnp.minimum(*a),
    "max": lambda *a: jnp.maximum.reduce(list(map(jnp.asarray, a))) if len(a) > 2 else jnp.maximum(*a),
    "floor": jnp.floor,
    "ceil": jnp.ceil,
}


def sanitize_expression(expression: str, variables: Mapping[str, Any]):
    """Rewrite variable names that are not valid Python identifiers.

    Returns ``(sanitized_expression, sanitized_variables)``. Mirrors reference
    utils.py:196-236 which substitutes names like ``lambda`` that collide with
    Python keywords.
    """
    import keyword
    import re

    sanitized_variables = {}
    sanitized_expression = expression
    for name, value in variables.items():
        if keyword.iskeyword(name) or not name.isidentifier():
            new_name = "_sanitized__" + re.sub(r"\W", "_", name)
            sanitized_expression = re.sub(
                r"\b" + re.escape(name) + r"\b", new_name, sanitized_expression
            )
            sanitized_variables[new_name] = value
        else:
            sanitized_variables[name] = value
    return sanitized_expression, sanitized_variables


def math_eval(expression: str, variables: Mapping[str, Any] | None = None,
              functions: Mapping[str, Any] | None = None):
    """Evaluate a math expression string with whitelisted operations only.

    Parameters mirror the reference ``math_eval`` (utils/utils.py:238-347).
    ``variables`` values may be numbers or JAX arrays/tracers.
    """
    variables = dict(variables or {})
    funcs = dict(_FUNCTIONS)
    if functions:
        funcs.update(functions)

    expression, variables = sanitize_expression(expression, variables)
    tree = ast.parse(expression, mode="eval")

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float, complex, bool)):
                return node.value
            raise ValueError(f"constant {node.value!r} not allowed")
        if isinstance(node, ast.Name):
            if node.id in variables:
                return variables[node.id]
            raise ValueError(f"undefined variable {node.id!r}")
        if isinstance(node, ast.UnaryOp):
            if type(node.op) not in _UNARY_OPS:
                raise ValueError(f"operator {node.op!r} not allowed")
            return _UNARY_OPS[type(node.op)](ev(node.operand))
        if isinstance(node, ast.BinOp):
            if type(node.op) not in _BINARY_OPS:
                raise ValueError(f"operator {node.op!r} not allowed")
            return _BINARY_OPS[type(node.op)](ev(node.left), ev(node.right))
        if isinstance(node, ast.BoolOp):
            # reference utils.py:301-310: and/or fold BITWISE left-to-right
            op = _BOOL_OPS[type(node.op)]
            out = ev(node.values[0])
            for v in node.values[1:]:
                out = op(out, ev(v))
            return out
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ValueError("chained comparisons not supported")
            if type(node.ops[0]) not in _COMPARE_OPS:
                raise ValueError(f"comparison {node.ops[0]!r} not allowed")
            return _COMPARE_OPS[type(node.ops[0])](ev(node.left), ev(node.comparators[0]))
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in funcs:
                raise ValueError(f"function call {ast.dump(node.func)} not allowed")
            if node.keywords:
                raise ValueError("keyword arguments not allowed")
            return funcs[node.func.id](*[ev(a) for a in node.args])
        raise ValueError(f"AST node {type(node).__name__} not allowed")

    return ev(tree)
