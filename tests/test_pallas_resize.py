import numpy as np
import jax
import jax.numpy as jnp

from videotofaces_tpu.ops import pallas_resize as PR

import oracles


def test_resize_normalize_matches_oracle(rng):
    imgs = [rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            for (h, w) in [(200, 150), (64, 64), (97, 211), (160, 160)]]
    packed, sizes = PR.pack_images(imgs, max_size=256)
    out = np.asarray(PR.resize_normalize_chw_u8(
        jnp.asarray(packed), jnp.asarray(sizes), out_size=160,
        scale=1 / 128.0, mean=127.5, swap_rb=True, interpret=True))

    for k, img in enumerate(imgs):
        want = oracles.np_bilinear_resize(img.astype(np.float64), (160, 160))
        want = (want[..., ::-1] - 127.5) / 128.0  # BGR->RGB, blobFromImages affine
        np.testing.assert_allclose(out[k], want, rtol=1e-3, atol=2e-3,
                                   err_msg=f"img {k} shape {img.shape}")


def test_pack_images_shrinks_oversized(rng):
    big = rng.integers(0, 256, size=(800, 600, 3)).astype(np.uint8)
    packed, sizes = PR.pack_images([big], max_size=256)
    assert packed.shape == (1, 3, 256, 256)
    assert sizes[0, 0] == 256 and sizes[0, 1] == 192


def test_encoder_device_resize_path(rng):
    """Encoder wrapper's Pallas device-resize path agrees with the host-cv2
    path to float tolerance (cv2 uses fixed-point interpolation)."""
    from videotofaces_tpu.models import vit as V
    from videotofaces_tpu.models.wrappers import VitEncoder

    model = V.ViT(img_size=128, patch_size=16, dim=128, depth=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]
    imgs = [rng.integers(0, 256, size=(s, s, 3)).astype(np.uint8) for s in (90, 150, 128)]

    host = VitEncoder(params=params)
    host.model, host.input_size = model, 128
    dev = VitEncoder(params=params, device_resize=True)
    dev.model, dev.input_size = model, 128
    # interpret mode on CPU: patch the kernel entry
    import videotofaces_tpu.ops.pallas_resize as PRZ
    orig = PRZ.resize_normalize_chw_u8
    PRZ_wrapped = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    PRZ.resize_normalize_chw_u8 = PRZ_wrapped
    try:
        out_host = host(imgs)
        out_dev = dev(imgs)
    finally:
        PRZ.resize_normalize_chw_u8 = orig
    assert out_host.shape == out_dev.shape
    # small numeric gap from cv2's fixed-point resize; embeddings stay close
    assert np.abs(out_host - out_dev).max() < 0.2
    assert np.abs(out_host - out_dev).mean() < 0.02
