"""Global runtime numerics configuration.

The framework runs float32 params everywhere; what varies is MXU precision:

- ``"highest"`` (default): true fp32 matmul/conv passes — used for parity with
  the reference's CPU/CUDA fp32 numerics (golden tests, IoU >= 0.99 targets).
- ``"default"``: XLA's fast path (bf16 multiplies on the MXU) — the production
  throughput mode; detector box IoU stays well above 0.99 in practice.

Use ``set_precision()`` or the ``precision_scope`` context manager.
"""

import contextlib

import jax.lax

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_state = {"precision": "highest"}


def set_precision(name: str):
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    _state["precision"] = name


def get_precision():
    return _PRECISIONS[_state["precision"]]


def get_precision_name():
    return _state["precision"]


@contextlib.contextmanager
def precision_scope(name: str):
    prev = _state["precision"]
    set_precision(name)
    try:
        yield
    finally:
        set_precision(prev)
