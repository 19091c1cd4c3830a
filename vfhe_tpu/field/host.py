"""Host-side (pure python int) Goldilocks + quadratic extension arithmetic.

The verifier and per-query FRI checks are scalar work — python ints beat
dispatching micro-kernels to a device by orders of magnitude there. Kept
in one place so the constraint evaluators can run generically over either
the batched jnp ops (prover) or these (verifier).

Extension elements are tuples (c0, c1) over x^2 = 7.
"""

from __future__ import annotations

from . import goldilocks as gl

P = gl.P
W = 7


def ext(c0: int, c1: int = 0):
    return (c0 % P, c1 % P)


def from_array(a):
    return (int(a[0]) % P, int(a[1]) % P)


def add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def mul(a, b):
    return ((a[0] * b[0] + W * a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P)


def mul_base(a, c: int):
    return ((a[0] * c) % P, (a[1] * c) % P)


def inv(a):
    norm = (a[0] * a[0] - W * a[1] * a[1]) % P
    ninv = pow(norm, P - 2, P)
    return ((a[0] * ninv) % P, (-a[1] * ninv) % P)


def pow_ext(a, e: int):
    result = ext(1)
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        base = mul(base, base)
    return result


class HostExtOps:
    """ops namespace for prover/constraints.eval_gate, scalar host mode."""
    add = staticmethod(add)
    sub = staticmethod(sub)
    mul = staticmethod(mul)

    @staticmethod
    def mul_int(x, c: int):
        return mul_base(x, c % P)

    @staticmethod
    def add_int(x, c: int):
        return ((x[0] + c) % P, x[1])

    @staticmethod
    def one_minus(x):
        return ((1 - x[0]) % P, (-x[1]) % P)
