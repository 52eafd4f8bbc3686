"""Checkpoint conversion and loading.

The reference loads torch checkpoints by *positional* state-dict remapping
(utils/weights.py:35-48) — source tensor order must match target module
definition order. Here that contract is made explicit and testable:

- each model declares an ordered ``spec``: a list of typed elements
  (conv / bn / linear / raw param) with flax tree paths, in the exact order
  the corresponding torch model registers its tensors;
- ``convert_state`` consumes an ordered list of source tensors against the
  spec, applying layout transforms (OIHW -> HWIO kernels, [out,in] -> [in,out]
  matrices) and skipping scalar ``num_batches_tracked`` entries;
- converted checkpoints are stored as named .npz files ("a/b/c" flat keys)
  and loaded back into flax param trees with shape validation.

The actual torch -> npz conversion runs offline once per pretrained file
(tools/convert_weights.py); the runtime never imports torch.
"""

import os
import os.path as osp

import numpy as np


# ---------------------------------------------------------------------------
# spec elements


def conv(path, bias=False):
    """torch Conv2d: weight [O, I, kh, kw] (+ bias [O]) -> kernel [kh, kw, I, O]."""
    return ("conv", path, bias)


def bn(path):
    """torch BatchNorm: weight, bias, running_mean, running_var
    (+ optional scalar num_batches_tracked, skipped)."""
    return ("bn", path)


def linear(path, bias=True):
    """torch Linear: weight [out, in] (+ bias) -> kernel [in, out]."""
    return ("linear", path, bias)


def linear_reshaped(path, src_shape, perm, bias=True):
    """torch Linear whose flattened input ordering differs from ours: weight
    [out, prod(src_shape)] is unflattened to [out, *src_shape], the input dims
    permuted by ``perm`` (e.g. CHW -> HWC), re-flattened, then transposed.
    Used for FC layers that consume flattened conv maps (NCHW vs NHWC)."""
    return ("linear_reshaped", path, tuple(src_shape), tuple(perm), bias)


def ln(path):
    """torch LayerNorm: weight, bias -> scale, bias."""
    return ("ln", path)


def param(path, transform=None):
    """A raw tensor copied as-is (or via ``transform``)."""
    return ("param", path, transform)


def convunit(path, bias=False, has_bn=True):
    """Our models/layers.ConvUnit: conv (+ bias) then optional BN."""
    els = [conv(f"{path}/conv", bias)]
    if has_bn:
        els.append(bn(f"{path}/bn"))
    return els


# ---------------------------------------------------------------------------
# conversion machinery


class _Source:
    """Ordered tensor stream with scalar-skip (num_batches_tracked etc.)."""

    def __init__(self, tensors):
        self.tensors = list(tensors)
        self.i = 0

    def next(self):
        while self.i < len(self.tensors) and np.asarray(self.tensors[self.i]).ndim == 0:
            self.i += 1  # skip num_batches_tracked-style scalars
        if self.i >= len(self.tensors):
            raise ValueError("source checkpoint ran out of tensors")
        t = np.asarray(self.tensors[self.i], dtype=np.float32)
        self.i += 1
        return t

    def done(self):
        while self.i < len(self.tensors) and np.asarray(self.tensors[self.i]).ndim == 0:
            self.i += 1
        return self.i >= len(self.tensors)


def convert_state(spec, tensors, strict=True):
    """Ordered source tensors + model spec -> flat {path: array} dict."""
    src = _Source(tensors)
    flat = {}
    for el in spec:
        kind = el[0]
        if kind == "conv":
            _, path, has_bias = el
            w = src.next()
            flat[f"{path}/kernel"] = np.transpose(w, (2, 3, 1, 0))
            if has_bias:
                flat[f"{path}/bias"] = src.next()
        elif kind == "bn":
            _, path = el
            flat[f"{path}/scale"] = src.next()
            flat[f"{path}/bias"] = src.next()
            flat[f"{path}/mean"] = src.next()
            flat[f"{path}/var"] = src.next()
        elif kind == "linear":
            _, path, has_bias = el
            w = src.next()
            flat[f"{path}/kernel"] = np.ascontiguousarray(w.T)
            if has_bias:
                flat[f"{path}/bias"] = src.next()
        elif kind == "linear_reshaped":
            _, path, src_shape, perm, has_bias = el
            w = src.next()
            out = w.shape[0]
            w = w.reshape((out,) + src_shape)
            w = np.transpose(w, (0,) + tuple(p + 1 for p in perm))
            flat[f"{path}/kernel"] = np.ascontiguousarray(w.reshape(out, -1).T)
            if has_bias:
                flat[f"{path}/bias"] = src.next()
        elif kind == "ln":
            _, path = el
            flat[f"{path}/scale"] = src.next()
            flat[f"{path}/bias"] = src.next()
        elif kind == "param":
            _, path, transform = el
            t = src.next()
            flat[path] = transform(t) if transform else t
        else:
            raise ValueError(f"unknown spec element {kind!r}")
    if strict and not src.done():
        raise ValueError(f"{len(tensors) - src.i} unconsumed source tensors")
    return flat


def unflatten(flat):
    tree = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def save_npz(path, flat):
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path, expected=None):
    """Load an .npz checkpoint into a nested param dict; validate shapes
    against an ``expected`` param tree (e.g. from ``model.init``) if given."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    if expected is not None:
        exp_flat = flatten(_to_numpy_tree(expected))
        missing = sorted(set(exp_flat) - set(flat))
        extra = sorted(set(flat) - set(exp_flat))
        if missing or extra:
            raise ValueError(f"checkpoint mismatch: missing={missing[:5]} extra={extra[:5]}")
        for k in exp_flat:
            if exp_flat[k].shape != flat[k].shape:
                raise ValueError(f"shape mismatch at {k}: {flat[k].shape} vs {exp_flat[k].shape}")
    return unflatten(flat)


def _to_numpy_tree(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


def weights_dir():
    """<repo-or-cwd>/weights cache directory (reference: utils/weights.py:64-68)."""
    home = osp.dirname(osp.dirname(osp.dirname(osp.realpath(__file__))))
    d = osp.join(home, "weights")
    os.makedirs(d, exist_ok=True)
    return d
