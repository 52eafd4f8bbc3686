"""Global runtime numerics configuration.

The framework runs float32 params everywhere; what varies is MXU precision:

- ``"highest"`` (default): true fp32 matmul/conv passes — used for parity with
  the reference's CPU/CUDA fp32 numerics (golden tests, IoU >= 0.99 targets).
- ``"default"``: XLA's fast path (bf16 multiplies on the MXU) — the production
  throughput mode; detector box IoU stays well above 0.99 in practice.

Use ``set_precision()`` or the ``precision_scope`` context manager.
"""

import contextlib
import os

import jax
import jax.lax

# Persistent XLA compilation cache: detector graphs are large (Faster R-CNN
# cold-compiles take minutes on remote-compile setups); cache them across
# processes. Override the location with V2F_COMPILE_CACHE, disable with "0".
_cache_dir = os.environ.get("V2F_COMPILE_CACHE", os.path.expanduser("~/.cache/v2f_xla"))
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # older jax without these options
        pass

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

# ContextVar (not a module-level dict) so precision_scope composes with the
# async pipeline: each thread/task sees its own scope and two models with
# different precision needs cannot race each other's setting.
import contextvars

_precision = contextvars.ContextVar("v2f_precision", default="highest")


def set_precision(name: str):
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    _precision.set(name)


def get_precision():
    return _PRECISIONS[_precision.get()]


def get_precision_name():
    return _precision.get()


@contextlib.contextmanager
def precision_scope(name: str):
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    token = _precision.set(name)
    try:
        yield
    finally:
        _precision.reset(token)
