import numpy as np
import jax
import jax.numpy as jnp
import torch

from videotofaces_tpu.models import facenet as FN
from videotofaces_tpu.models import vit as V
from videotofaces_tpu.utils import weights as W

import torch_ref as TR


def test_facenet_torch_state_converts_and_matches(rng, tmp_path):
    """torch state_dict (registration order) -> spec conversion -> flax params
    -> identical forward outputs."""
    tm = TR.TFaceNet()
    tm.eval()
    # randomize torch params so the comparison is non-trivial
    gen = torch.Generator().manual_seed(0)
    sd = tm.state_dict()
    for k in sd:
        if sd[k].ndim > 0:
            sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.05
            if k.endswith("running_var"):
                sd[k] = sd[k].abs() + 0.5
    tm.load_state_dict(sd)

    tensors = [np.asarray(v.float().numpy()) for k, v in sd.items()
               if not k.endswith("num_batches_tracked")]
    flat = W.convert_state(FN.torch_spec(), tensors)
    path = str(tmp_path / "facenet.npz")
    W.save_npz(path, flat)

    model = FN.InceptionResnetV1()
    expected = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)))["params"]
    params = W.load_params(path, expected=expected)

    x = rng.normal(0, 1, size=(2, 160, 160, 3)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(TR.nhwc_to_torch(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_vit_torch_state_converts_and_matches(rng, tmp_path):
    tm = TR.TViT(img=32, patch=16, dim=128, depth=2)
    tm.eval()
    gen = torch.Generator().manual_seed(1)
    sd = tm.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.08
    tm.load_state_dict(sd)

    tensors = [np.asarray(v.float().numpy()) for v in sd.values()]
    flat = W.convert_state(V.torch_spec(depth=2), tensors)

    model = V.ViT(img_size=32, patch_size=16, dim=128, depth=2)
    expected = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    params = W.load_params_from_flat(flat, expected) if hasattr(W, "load_params_from_flat") \
        else W.unflatten(flat)

    x = rng.normal(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(TR.nhwc_to_torch(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_load_params_shape_validation(tmp_path):
    flat = {"a/kernel": np.zeros((3, 3)), "b/bias": np.zeros((4,))}
    path = str(tmp_path / "ckpt.npz")
    W.save_npz(path, flat)
    expected = {"a": {"kernel": np.zeros((3, 3))}, "b": {"bias": np.zeros((5,))}}
    try:
        W.load_params(path, expected=expected)
        raise AssertionError("expected shape mismatch error")
    except ValueError as e:
        assert "shape mismatch" in str(e)
