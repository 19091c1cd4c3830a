"""In-circuit quadratic-extension arithmetic on target pairs.

Groundwork for the recursive (in-circuit) proof verifier — the
reference gets these from plonky2's ExtensionTarget/ArithmeticExtension
gates (used throughout its in-circuit FRI verification). An extension
target is an (..., 2) array of targets [c0, c1] over x^2 = 7.
"""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl


def ext_from_base(b, x) -> np.ndarray:
    """(...,) base targets -> (..., 2) with zero imaginary part."""
    x = np.asarray(x, dtype=np.int64)
    z = np.full(x.shape, b.zero(), dtype=np.int64)
    return np.stack([x, z], axis=-1)


def ext_constant(b, c0: int, c1: int = 0) -> np.ndarray:
    return np.array([b.constant(c0), b.constant(c1)], dtype=np.int64)


def _batch_shape(x, y):
    return np.broadcast_shapes(np.asarray(x)[..., 0].shape,
                               np.asarray(y)[..., 0].shape)


def ext_add(b, x, y) -> np.ndarray:
    sh = _batch_shape(x, y)
    return np.stack([b.add_vec(x[..., 0], y[..., 0]).reshape(sh),
                     b.add_vec(x[..., 1], y[..., 1]).reshape(sh)], axis=-1)


def ext_sub(b, x, y) -> np.ndarray:
    sh = _batch_shape(x, y)
    return np.stack([b.sub_vec(x[..., 0], y[..., 0]).reshape(sh),
                     b.sub_vec(x[..., 1], y[..., 1]).reshape(sh)], axis=-1)


def ext_mul(b, x, y) -> np.ndarray:
    """(x0 + x1 w)(y0 + y1 w) = x0 y0 + 7 x1 y1 + (x0 y1 + x1 y0) w."""
    sh = _batch_shape(x, y)
    x0 = np.broadcast_to(np.asarray(x)[..., 0], sh).ravel()
    x1 = np.broadcast_to(np.asarray(x)[..., 1], sh).ravel()
    y0 = np.broadcast_to(np.asarray(y)[..., 0], sh).ravel()
    y1 = np.broadcast_to(np.asarray(y)[..., 1], sh).ravel()
    t00 = b.mul_vec(x0, y0)
    t11 = b.mul_vec(x1, y1)
    seven = np.full(t11.shape, b.constant(7), dtype=np.int64)
    c0 = b.mul_add_vec(seven, t11, t00)
    t01 = b.mul_vec(x0, y1)
    c1 = b.mul_add_vec(x1, y0, t01)
    return np.stack([c0.reshape(sh), c1.reshape(sh)], axis=-1)


def ext_mul_base(b, x, s) -> np.ndarray:
    """Extension targets times base-field targets (broadcast)."""
    s = np.broadcast_to(np.asarray(s, dtype=np.int64), x[..., 0].shape)
    return np.stack([b.mul_vec(x[..., 0], s),
                     b.mul_vec(x[..., 1], s)], axis=-1)


def ext_select(b, ctrl, x, y) -> np.ndarray:
    return np.stack([b.select_vec(ctrl, x[..., 0], y[..., 0]),
                     b.select_vec(ctrl, x[..., 1], y[..., 1])], axis=-1)


def ext_inverse(b, x) -> np.ndarray:
    """Witness-provided inverse, constrained by x * inv == 1."""
    x = np.asarray(x, dtype=np.int64)
    inv = b.add_virtual_targets(x.size).reshape(x.shape)
    b._defined.update(inv.ravel().tolist())
    from ..circuit.builder import _WitnessOp
    b._ops.append(_WitnessOp("ext_inv", dict(x=x.reshape(-1, 2),
                                             out=inv.reshape(-1, 2))))
    prod = ext_mul(b, x, inv)
    one = np.broadcast_to(np.array([b.one(), b.zero()]), prod.shape)
    b.connect_vec(prod.ravel(), one.ravel())
    return inv


def ext_scalar_mul_const(b, x, c0: int, c1: int = 0) -> np.ndarray:
    return ext_mul(b, x, np.broadcast_to(
        ext_constant(b, c0, c1), x.shape).astype(np.int64))


def ext_powers(b, x, count: int) -> np.ndarray:
    """[1, x, x^2, ..., x^{count-1}] as (count, 2) targets."""
    out = [ext_constant(b, 1)]
    for _ in range(count - 1):
        out.append(ext_mul(b, out[-1], x))
    return np.stack(out, axis=0)


def ext_inner(b, coeffs, values) -> np.ndarray:
    """sum_i coeffs[i] * values[i] over (L, 2) target stacks."""
    prods = ext_mul(b, coeffs, values)
    acc = prods[0]
    for i in range(1, prods.shape[0]):
        acc = ext_add(b, acc, prods[i])
    return acc
