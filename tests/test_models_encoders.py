import numpy as np
import jax
import jax.numpy as jnp
import torch

from videotofaces_tpu.models import vit as V
from videotofaces_tpu.models import facenet as FN

import torch_ref as TR


def _randomize(params, rng, scale=0.08):
    def f(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        x = rng.normal(0.0, scale, a.shape).astype(np.float32)
        if name == "var":
            x = np.abs(x) + 0.5
        elif name in ("scale",):
            x = 1.0 + x
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(f, params)


def test_vit_tiny_matches_torch(rng):
    m = V.ViT(img_size=32, patch_size=16, dim=128, depth=2)
    x = rng.normal(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = _randomize(params, rng)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    tm = TR.TViT(img=32, patch=16, dim=128, depth=2)
    tm.eval()
    tm.load(jax.tree.map(np.asarray, params))
    with torch.no_grad():
        want = tm(TR.nhwc_to_torch(x)).numpy()
    assert got.shape == (2, 128)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_vit_b16_shapes():
    m = V.vit_b16()
    x = jnp.zeros((1, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (1, 768)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    # ViT-B16: ~85.8M backbone params (no head)
    assert 80e6 < n_params < 92e6


def test_facenet_matches_torch(rng):
    m = FN.InceptionResnetV1()
    x = rng.normal(0, 1, size=(2, 160, 160, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = _randomize(params, rng, scale=0.05)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    tm = TR.TFaceNet()
    tm.eval()
    tm.load(jax.tree.map(np.asarray, params))
    with torch.no_grad():
        want = tm(TR.nhwc_to_torch(x)).numpy()
    assert got.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_preprocess_affines():
    u8 = jnp.asarray(np.array([[[[0, 127, 255]]]], dtype=np.uint8))
    v = np.asarray(V.preprocess_uint8(u8))
    np.testing.assert_allclose(v.ravel(), [(0 - 127.5) / 127.5, (127 - 127.5) / 127.5, 1.0], rtol=1e-6)
    f = np.asarray(FN.preprocess_uint8(u8))
    np.testing.assert_allclose(f.ravel(), [(0 - 127.5) / 128, (127 - 127.5) / 128, (255 - 127.5) / 128], rtol=1e-6)
