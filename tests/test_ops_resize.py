import numpy as np
import jax.numpy as jnp

from videotofaces_tpu.ops import resize as R

import oracles


def test_adaptive_pool_full_matches_torch(rng):
    """The pyramid resample (integral-image form) == F.adaptive_avg_pool2d."""
    import torch
    import torch.nn.functional as F

    x = rng.integers(0, 256, size=(2, 37, 53, 3)).astype(np.uint8)
    ii = R.integral_image(jnp.asarray(x))
    t = torch.from_numpy(x.astype(np.float32)).permute(0, 3, 1, 2)
    for out in [(24, 24), (12, 30), (37, 53)]:
        got = np.asarray(R.adaptive_pool_full(ii, out, (37, 53)))
        want = F.adaptive_avg_pool2d(t, out).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_adaptive_pool_full_upsample_matches_torch(rng):
    # MTCNN pyramid can upscale (sizes = int(H*s+1)); adaptive pool handles it too
    import torch
    import torch.nn.functional as F

    x = rng.integers(0, 256, size=(1, 20, 20, 3)).astype(np.uint8)
    ii = R.integral_image(jnp.asarray(x))
    got = np.asarray(R.adaptive_pool_full(ii, (49, 49), (20, 20)))
    want = F.adaptive_avg_pool2d(torch.from_numpy(x.astype(np.float32)).permute(0, 3, 1, 2),
                                 (49, 49))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-4)


def test_bilinear_resize_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.uniform(0, 255, size=(2, 31, 47, 3)).astype(np.float32)
    for out in [(160, 160), (17, 23), (62, 94)]:
        got = np.asarray(R.bilinear_resize(jnp.asarray(x), out))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(t, size=out, mode="bilinear", align_corners=False)
        np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-3)


def test_integral_adaptive_pool_boxes_exact(rng):
    frames = rng.integers(0, 256, size=(2, 120, 160, 3)).astype(np.uint8)
    ii = np.asarray(R.integral_image(jnp.asarray(frames)))
    assert ii.shape == (2, 121, 161, 3)

    boxes = []
    for _ in range(12):
        x1 = int(rng.integers(0, 100))
        y1 = int(rng.integers(0, 80))
        boxes.append([x1, y1, x1 + int(rng.integers(5, 60)), y1 + int(rng.integers(5, 40))])
    boxes = np.asarray(boxes, dtype=np.int32)
    boxes[:, 2] = boxes[:, 2].clip(max=160)
    boxes[:, 3] = boxes[:, 3].clip(max=120)

    got = np.asarray(R.adaptive_pool_boxes(jnp.asarray(ii[0]), jnp.asarray(boxes), (24, 24)))
    for k, (x1, y1, x2, y2) in enumerate(boxes):
        crop = frames[0, y1:y2, x1:x2].astype(np.float64)
        want = oracles.np_adaptive_avg_pool(crop, (24, 24))
        np.testing.assert_allclose(got[k], want, rtol=1e-6, atol=1e-4)


def test_adaptive_pool_full_s2d2_matches_unpacked(rng):
    """The packed-layout pyramid pool equals adaptive_pool_full rearranged
    into space-to-depth-2 blocks, for even and odd output sizes (phantom
    odd-edge phases excluded — their values are unspecified)."""
    frames = rng.integers(0, 256, size=(2, 90, 130, 3)).astype(np.uint8)
    ii = R.integral_image(jnp.asarray(frames))
    for oh, ow in [(45, 65), (44, 64), (123, 177), (216, 312)]:
        ref = np.asarray(R.adaptive_pool_full(ii, (oh, ow), (90, 130)))
        got = np.asarray(R.adaptive_pool_full_s2d2(ii, (oh, ow), (90, 130)))
        assert got.shape == (2, -(-oh // 2), -(-ow // 2), 12)
        for pr in (0, 1):
            for pc in (0, 1):
                g = got[..., (pr * 2 + pc) * 3:(pr * 2 + pc) * 3 + 3]
                # real phase positions only
                nr = (oh - pr + 1) // 2
                nc = (ow - pc + 1) // 2
                want = ref[:, pr::2, pc::2][:, :nr, :nc]
                np.testing.assert_allclose(g[:, :nr, :nc], want, rtol=1e-6, atol=1e-5)


def test_adaptive_pool_full_chw_matches_nhwc(rng):
    """The channel-major pyramid pool is bit-identical to adaptive_pool_full
    (same exact int32 sums and f32 division), just transposed."""
    frames = rng.integers(0, 256, size=(2, 90, 130, 3)).astype(np.uint8)
    ii = R.integral_image(jnp.asarray(frames))
    iic = R.integral_image_chw(jnp.asarray(frames))
    for oh, ow in [(45, 65), (44, 64), (123, 177), (216, 312)]:
        ref = np.asarray(R.adaptive_pool_full(ii, (oh, ow), (90, 130)))
        got = np.asarray(R.adaptive_pool_full_chw(iic, (oh, ow), (90, 130)))
        assert got.shape == (2, 3, oh, ow)
        np.testing.assert_array_equal(got.transpose(0, 2, 3, 1), ref)


def test_adaptive_pool_full_chw_phase_matches_chw(rng):
    """The phase-split pyramid pool's blocks are bit-identical to the plain
    chw pool's even/odd columns (pure gather reordering), pads finite."""
    from videotofaces_tpu.ops.pallas_pnet import phase_block_w

    frames = rng.integers(0, 256, size=(2, 90, 130, 3)).astype(np.uint8)
    iic = R.integral_image_chw(jnp.asarray(frames))
    for oh, ow in [(45, 65), (44, 64), (123, 177)]:
        ref = np.asarray(R.adaptive_pool_full_chw(iic, (oh, ow), (90, 130)))
        got = np.asarray(R.adaptive_pool_full_chw_phase(iic, (oh, ow), (90, 130)))
        wb = phase_block_w(ow)
        assert got.shape == (2, 3, oh, 2 * wb)
        np.testing.assert_array_equal(got[..., :(ow + 1) // 2], ref[..., 0::2])
        np.testing.assert_array_equal(got[..., wb:wb + ow // 2], ref[..., 1::2])
        assert np.isfinite(got).all()


def test_adaptive_pool_full_chw_phase_mm_exact(rng):
    """The gather-free mm phase pool is BIT-IDENTICAL to the integral-image
    phase pool (after normalize) on <=2-wide-window levels, in f32 and in
    bf16, with all-finite (zero) dead pad columns."""
    from videotofaces_tpu.ops.pallas_pnet import phase_block_w

    frames = rng.integers(0, 256, size=(2, 45, 61, 3)).astype(np.uint8)
    iic = R.integral_image_chw(jnp.asarray(frames))
    fn32 = (jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
            .astype(jnp.float32) - 127.5) / 128.0
    for oh, ow in [(108, 146), (52, 70), (45, 61), (107, 145)]:
        assert R.pool_windows_le2((oh, ow), (45, 61))
        ref = (np.asarray(R.adaptive_pool_full_chw_phase(
            iic, (oh, ow), (45, 61))) - 127.5) / 128.0
        wb = phase_block_w(ow)
        live = np.zeros(2 * wb, bool)
        live[:(ow + 1) // 2] = True
        live[wb:wb + ow // 2] = True
        got = np.asarray(R.adaptive_pool_full_chw_phase_mm(fn32, (oh, ow), (45, 61)))
        assert got.shape == (2, 3, oh, 2 * wb) and got.dtype == np.float32
        np.testing.assert_array_equal(got[..., live], ref[..., live])
        np.testing.assert_array_equal(got[..., ~live], 0.0)
        got16 = R.adaptive_pool_full_chw_phase_mm(
            fn32.astype(jnp.bfloat16), (oh, ow), (45, 61))
        assert got16.dtype == jnp.bfloat16
        ref16 = jnp.asarray(ref).astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(got16.astype(jnp.float32))[..., live],
            np.asarray(ref16.astype(jnp.float32))[..., live])


def test_adaptive_pool_full_phase_mm01_exact_any_window(rng):
    """The {0,1}-matmul phase pool is BIT-IDENTICAL to the integral-image
    phase pool for ARBITRARY (downscale) window sizes — exact small-integer
    f32 accumulation — in both f32 and bf16 input dtypes; dead pad columns
    are exactly 0."""
    from videotofaces_tpu.ops.pallas_pnet import phase_block_w

    frames = rng.integers(0, 256, size=(2, 90, 130, 3)).astype(np.uint8)
    iic = R.integral_image_chw(jnp.asarray(frames))
    fr_chw = jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
    for oh, ow in [(39, 56), (28, 40), (14, 20), (7, 10), (5, 7)]:
        assert not R.pool_windows_le2((oh, ow), (90, 130))
        ref = np.asarray(R.adaptive_pool_full_chw_phase(
            iic, (oh, ow), (90, 130)))
        wb = phase_block_w(ow)
        live = np.zeros(2 * wb, bool)
        live[:(ow + 1) // 2] = True
        live[wb:wb + ow // 2] = True
        for dt in (jnp.float32, jnp.bfloat16):
            got = np.asarray(R.adaptive_pool_full_phase_mm01(
                fr_chw.astype(dt), (oh, ow), (90, 130)))
            assert got.shape == (2, 3, oh, 2 * wb) and got.dtype == np.float32
            np.testing.assert_array_equal(got[..., live], ref[..., live])
            np.testing.assert_array_equal(got[..., ~live], 0.0)


def test_pool_windows_le2_regimes():
    """Window-width predicate: true for upsample/identity and mild
    downsample (< 2x), false once any window can reach 3 wide."""
    assert R.pool_windows_le2((90, 130), (45, 61))   # 2x upsample
    assert R.pool_windows_le2((45, 61), (45, 61))    # identity
    assert R.pool_windows_le2((46, 62), (45, 61))    # slight upsample
    assert R.pool_windows_le2((30, 61), (45, 61))    # exact-1.5x rows: grid-aligned
    assert not R.pool_windows_le2((28, 61), (45, 61))   # 1.6x rows: 3-wide windows
    assert not R.pool_windows_le2((45, 20), (45, 61))   # 3x downsample cols
