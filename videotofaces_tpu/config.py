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

# Two layers so BOTH of these hold:
# - set_precision() is PROCESS-WIDE: serving daemons trace graphs inside
#   fresh handler threads (ThreadingHTTPServer/TCPServer), whose contexts
#   never inherit a main-thread ContextVar write — a plain ContextVar
#   default silently undid the setting there;
# - precision_scope() stays CONTEXT-LOCAL (ContextVar token), so concurrent
#   scopes in different threads/tasks cannot race each other's override.
import contextvars

_process_default = ["highest"]
_precision = contextvars.ContextVar("v2f_precision")


def set_precision(name: str):
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    _process_default[0] = name


def get_precision():
    return _PRECISIONS[get_precision_name()]


def get_precision_name():
    return _precision.get(None) or _process_default[0]


@contextlib.contextmanager
def precision_scope(name: str):
    assert name in _PRECISIONS, f"unknown precision {name!r}"
    token = _precision.set(name)
    try:
        yield
    finally:
        _precision.reset(token)
