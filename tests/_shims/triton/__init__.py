"""Triton import stub: kernels are never launched in parity tests."""
def jit(fn=None, **kwargs):
    if fn is None:
        return lambda f: f
    return fn
class Config:  # pragma: no cover
    def __init__(self, *a, **k): pass
def autotune(*a, **k):
    return lambda f: f
def cdiv(a, b):
    return -(-a // b)
from . import language  # noqa: F401  (torch._dynamo expects the submodule)
