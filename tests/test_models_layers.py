import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from videotofaces_tpu.models import layers as L

import torch_ref as TR


def test_convunit_matches_torch(rng):
    cases = [
        dict(cin=3, cout=8, k=3, s=1, p=1, activ="relu", bn_eps=1e-5),
        dict(cin=8, cout=16, k=3, s=2, p=1, activ="lrelu_0.1", bn_eps=1e-5),
        dict(cin=8, cout=10, k=1, s=1, p=0, activ="prelu", bn_eps=None, bias=True),
        dict(cin=6, cout=6, k=(1, 7), s=1, p=(0, 3), activ="relu", bn_eps=1e-3),
        dict(cin=4, cout=12, k=3, s=1, p=0, activ="hardswish", bn_eps=1e-5),
    ]
    for c in cases:
        cin = c.pop("cin")
        m = L.ConvUnit(c["cout"], c["k"], c.get("s", 1), c.get("p", 0), c.get("activ"),
                       c.get("bn_eps", 1e-5), bias=c.get("bias"))
        x = rng.normal(size=(2, 17, 19, cin)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        # randomize bn stats so the test is non-trivial
        params = jax.tree.map(lambda a: jnp.asarray(rng.normal(0.1, 0.5, a.shape), a.dtype), params)
        if "bn" in params:
            params["bn"]["var"] = jnp.abs(params["bn"]["var"]) + 0.5
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

        tm = TR.TConvUnit(cin, c["cout"], c["k"], c.get("s", 1), c.get("p", 0),
                          c.get("activ"), c.get("bn_eps", 1e-5), bias=c.get("bias"))
        tm.eval()
        tm.load(jax.tree.map(np.asarray, params))
        with torch.no_grad():
            want = TR.torch_to_nhwc(tm(TR.nhwc_to_torch(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convunit_residual_add(rng):
    m = L.ConvUnit(8, 3, 1, 1, activ="relu", bn_eps=1e-5)
    x = rng.normal(size=(1, 9, 9, 8)).astype(np.float32)
    add = rng.normal(size=(1, 9, 9, 8)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    y_with = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(add))
    y_base = m.apply({"params": params}, jnp.asarray(x))
    # relu(conv_bn(x) + add) != relu(conv_bn(x)) + add in general
    assert not np.allclose(np.asarray(y_with), np.asarray(y_base) + add)


def test_max_pool2d_matches_torch(rng):
    for (h, w) in [(11, 13), (24, 24), (7, 7)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        for k, s, p, ceil in [(2, 2, 0, True), (3, 2, 0, True), (3, 2, 1, False),
                              (3, 2, 0, False), (2, 2, 0, False), (3, 1, 1, False)]:
            got = np.asarray(L.max_pool2d(jnp.asarray(x), k, s, p, ceil))
            tm = tnn.MaxPool2d(k, s, padding=p, ceil_mode=ceil)
            want = TR.torch_to_nhwc(tm(TR.nhwc_to_torch(x)))
            assert got.shape == want.shape, (k, s, p, ceil, got.shape, want.shape)
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool2d_gradient_matches_torch(rng):
    """Training differentiates through pools (train/triplet.py); the grad
    must route 1.0 to each window argmax exactly like torch."""
    import torch

    x = rng.normal(size=(2, 11, 13, 3)).astype(np.float32)
    for k, s, p, ceil in [(2, 2, 0, True), (3, 2, 0, False), (3, 2, 1, False)]:
        g = jax.grad(lambda a: jnp.sum(L.max_pool2d(a, k, s, p, ceil) ** 2))(
            jnp.asarray(x))
        xt = TR.nhwc_to_torch(x)
        xt.requires_grad_(True)
        tm = tnn.MaxPool2d(k, s, padding=p, ceil_mode=ceil)
        (tm(xt) ** 2).sum().backward()
        want = np.transpose(xt.grad.detach().numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)


def test_layernorm_matches_torch(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    m = L.LayerNorm(16, eps=1e-12)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(lambda a: jnp.asarray(rng.normal(0.2, 0.8, a.shape), a.dtype), params)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    tm = tnn.LayerNorm(16, eps=1e-12)
    tm.weight.data = TR.t(np.asarray(params["scale"]))
    tm.bias.data = TR.t(np.asarray(params["bias"]))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
