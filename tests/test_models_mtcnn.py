import numpy as np
import jax
import jax.numpy as jnp

from videotofaces_tpu.models import mtcnn as M

import mtcnn_oracle as MO


def _init_params(rng):
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }

    def rnd(path, a):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        x = rng.normal(0.0, 0.25, a.shape).astype(np.float32)
        if name.endswith("alpha"):
            x = np.abs(x) * 0.5 + 0.1
        # cls heads: mostly-below-threshold probabilities with a small tail above
        if "cls" in name and name.endswith("bias"):
            x = rng.normal(-0.4, 0.5, a.shape).astype(np.float32)
        if "reg" in name or "lmk" in name:
            x = x * 0.02
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(rnd, params)


def test_mtcnn_subnets_match_torch(rng):
    params = _init_params(rng)
    x24 = rng.normal(0, 0.5, size=(3, 24, 24, 3)).astype(np.float32)
    x48 = rng.normal(0, 0.5, size=(3, 48, 48, 3)).astype(np.float32)
    x20 = rng.normal(0, 0.5, size=(2, 20, 30, 3)).astype(np.float32)

    import torch

    tp = MO.TPNet(); tp.eval(); tp.load(jax.tree.map(np.asarray, params["pnet"]))
    tr = MO.TRNet(); tr.eval(); tr.load(jax.tree.map(np.asarray, params["rnet"]))
    to = MO.TONet(); to.eval(); to.load(jax.tree.map(np.asarray, params["onet"]))

    reg, prob = M.PNet().apply({"params": params["pnet"]}, jnp.asarray(x20))
    with torch.no_grad():
        treg, tprob = tp(torch.from_numpy(x20.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg), treg.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)

    reg, prob = M.RNet().apply({"params": params["rnet"]}, jnp.asarray(x24))
    with torch.no_grad():
        treg, tprob = tr(torch.from_numpy(x24.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg), treg.numpy(), rtol=1e-4, atol=1e-5)

    reg, lmk, prob = M.ONet().apply({"params": params["onet"]}, jnp.asarray(x48))
    with torch.no_grad():
        treg, tlmk, tprob = to(torch.from_numpy(x48.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmk), tlmk.numpy(), rtol=1e-4, atol=1e-5)


def test_mtcnn_cascade_matches_oracle(rng):
    params = _init_params(rng)
    frames = rng.integers(0, 255, size=(2, 96, 128, 3)).astype(np.uint8)
    caps = M.Caps(pre1=1024, post1=256, cross=1024, stage2=512, stage3=512, out=512)
    fn = jax.jit(lambda p, f: M.full_forward(p, f, minsize=20, caps=caps))
    boxes, scores, lmk, valid, counts = jax.device_get(fn(params, jnp.asarray(frames)))

    tp = MO.TPNet(); tp.eval(); tp.load(jax.tree.map(np.asarray, params["pnet"]))
    tr = MO.TRNet(); tr.eval(); tr.load(jax.tree.map(np.asarray, params["rnet"]))
    to = MO.TONet(); to.eval(); to.load(jax.tree.map(np.asarray, params["onet"]))
    want = MO.run_cascade(tp, tr, to, frames, minsize=20)

    assert counts["stage1"].sum() > 0, "test params produced no stage-1 candidates"
    some_output = False
    for i in range(2):
        v = valid[i]
        wb, ws, wl = want[i]
        assert v.sum() == len(wb), (i, int(v.sum()), len(wb))
        if len(wb):
            some_output = True
            np.testing.assert_allclose(scores[i][v], ws, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(boxes[i][v], wb, rtol=1e-3, atol=2e-2)
            np.testing.assert_allclose(lmk[i][v], wl, rtol=1e-3, atol=2e-2)
    assert some_output, "oracle produced no final boxes — tune test params"


def test_mtcnn_spec_structure():
    from videotofaces_tpu.utils import weights as W

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    spec = M.torch_spec()
    paths = set()
    for el in spec:
        kind, path = el[0], el[1]
        if kind == "conv":
            paths.add(f"{path}/kernel")
            paths.add(f"{path}/bias")
        elif kind == "linear":
            paths.add(f"{path}/kernel")
            paths.add(f"{path}/bias")
        elif kind == "param":
            paths.add(path)
    want = set(W.flatten(jax.tree.map(np.asarray, params)))
    assert paths == want, (sorted(paths - want)[:5], sorted(want - paths)[:5])


def test_stage1_block_select_matches_exact_topk(rng):
    """In throughput mode, big pyramid levels select candidates with the
    lane-block top-k; results must match the exact lax.top_k path (parity
    mode) on ordinary inputs."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu import config
    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():  # make some candidates fire
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=128, stage2=64, stage3=32, out=16)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 96, 128, 3)).astype(np.uint8))

    with config.precision_scope("highest"):
        exact = M.full_forward(params, frames, minsize=5, caps=caps)
    with config.precision_scope("default"):
        fast = M.full_forward(params, frames, minsize=5, caps=caps)
    # d at the largest level is > 4*pre1, so the fast run used block-select
    np.testing.assert_array_equal(np.asarray(exact[3]), np.asarray(fast[3]))  # valid
    np.testing.assert_allclose(np.asarray(exact[0]), np.asarray(fast[0]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(exact[1]), np.asarray(fast[1]),
                               rtol=1e-4, atol=1e-4)


def test_pnet_s2d_head_matches_standard(rng):
    """The space-to-depth conv1+prelu+ceil-pool head is tap-identical to the
    module path, including odd level sizes (ceil-mode edge windows)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    for sh, sw in [(12, 12), (13, 17), (24, 31), (27, 26)]:
        x = jnp.asarray(rng.normal(0, 0.5, size=(2, sh, sw, 3)).astype(np.float32))
        want_reg, want_prob = M.PNet().apply({"params": params}, x)
        pooled = M.pnet_s2d_head(params, x)
        got_reg, got_prob = M.PNet(from_pool1=True).apply({"params": params}, pooled)
        np.testing.assert_allclose(np.asarray(got_prob), np.asarray(want_prob),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_reg), np.asarray(want_reg),
                                   rtol=1e-5, atol=1e-5)


def test_pnet_packed_pool_stem_matches_standard(rng):
    """Packed-layout pyramid pooling + packed conv1 head (pnet_stem="packed")
    reproduces the module's pool1 map, including odd level sizes (phantom
    phases in the packed input must only feed masked outputs)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.resize import (adaptive_pool_full,
                                             adaptive_pool_full_s2d2,
                                             integral_image)

    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    frames = jnp.asarray(rng.integers(0, 255, size=(2, 80, 100, 3)).astype(np.uint8))
    ii = integral_image(frames[..., ::-1])
    for sh, sw in [(40, 50), (41, 53), (97, 121), (120, 150)]:
        level = M._normalize(adaptive_pool_full(ii, (sh, sw), (80, 100)))
        want = M.PNet(to_pool1=True).apply({"params": params}, level)
        packed = M._normalize(adaptive_pool_full_s2d2(ii, (sh, sw), (80, 100)))
        got = M.pnet_s2d_head(params, packed, packed_hw=(sh, sw))
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pnet_s2d_tail_matches_module(rng):
    """The space-to-depth-2 packed conv2/conv3/heads tail is tap-identical to
    the module path on the same pool1 map, including odd pool1 sizes (phantom
    phase rows/cols must be sliced, not leak)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    for sh, sw in [(12, 12), (13, 17), (24, 31), (27, 26)]:
        x = jnp.asarray(rng.normal(0, 0.5, size=(2, sh, sw, 3)).astype(np.float32))
        want_reg, want_prob = M.PNet().apply({"params": params}, x)
        pool1 = M.PNet(to_pool1=True).apply({"params": params}, x)
        got_reg, got_prob = M.pnet_s2d_tail(params, pool1)
        assert got_prob.shape == want_prob.shape
        np.testing.assert_allclose(np.asarray(got_prob), np.asarray(want_prob),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_reg), np.asarray(want_reg),
                                   rtol=1e-5, atol=1e-5)


def test_cascade_s2d_tail_matches_module_path(rng):
    """Full cascade with pnet_tail='s2d' reproduces the module path's
    detections (same valid set, boxes/scores to accumulation tolerance)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    # odd frame size: odd pool1/prob-map levels make the packed selection's
    # phantom-phase masking and packed flat-index -> (x, y) arithmetic
    # load-bearing, not just the even-size fast path
    for fh, fw in [(64, 96), (63, 97)]:
        frames = jnp.asarray(rng.integers(0, 255, size=(1, fh, fw, 3)).astype(np.uint8))

        ref = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", pnet_stem="module",
                             pnet_tail="module")
        assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
        v = np.asarray(ref[3])
        for stem, tail in [("module", "s2d"), ("packed", "module"),
                           ("packed", "s2d")]:
            got = M.full_forward(params, frames, minsize=14, caps=caps,
                                 crop_engine="gather", pnet_stem=stem,
                                 pnet_tail=tail)
            np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
            np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                                       rtol=1e-4, atol=1e-4)


def test_cascade_pallas_crop_engine_matches_gather(rng):
    """Full cascade with the pallas crop engine (interpret mode on CPU) must
    reproduce the gather engine's detections: same valid set, same boxes and
    scores to f32-accumulation tolerance."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():  # make some candidates fire
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.uint8))

    ref = M.full_forward(params, frames, minsize=14, caps=caps,
                         crop_engine="gather")
    got = M.full_forward(params, frames, minsize=14, caps=caps,
                         crop_engine="pallas-interpret")
    assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
    v = np.asarray(ref[3])
    np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                               rtol=1e-4, atol=1e-4)
    assert int(np.asarray(got[4]["stage2_crop_dropped"]).sum()) == 0
    assert int(np.asarray(got[4]["stage3_crop_dropped"]).sum()) == 0


def test_cascade_fast_mode_block_select_matches_module(rng):
    """Throughput ("default") precision turns on the block-top-k stage-1
    selection (index-only, ops/select.py::block_topk_indices) and the
    packed stem/tail defaults; on CPU (f32 math regardless of the MXU
    precision flag) the cascade must reproduce the parity path's detections.
    caps.pre1=32 on a 64x96 frame makes the largest level's d exceed 4*k1,
    so the block branch actually fires."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu import config
    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.uint8))

    ref = M.full_forward(params, frames, minsize=14, caps=caps,
                         crop_engine="gather", pnet_stem="module",
                         pnet_tail="module")
    assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
    with config.precision_scope("default"):
        got = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather")
    v = np.asarray(ref[3])
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
    np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                               rtol=1e-4, atol=1e-4)


def test_cascade_onehot_pick_matches_gather_pick(rng):
    """stage1_pick='onehot' (gather-free one-hot einsum payload extraction,
    the ROADMAP fallback for pathological TPU row-gather rates) reproduces
    the default take_along_axis path exactly. Fast mode + pre1=32 so the
    block-top-k branch (where the pick matters) actually fires."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu import config
    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.uint8))

    with config.precision_scope("default"):
        ref = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", stage1_pick="gather")
        got = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", stage1_pick="onehot")
    assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
    for r, g in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_pnet_s2d4_stem_matches_standard(rng):
    """The fully-packed stem (s2d4 pyramid pooling + K=48 packed conv1 +
    channel-group maxpool) reproduces the module's pool1 map in the tail's
    s2d2-packed layout, across odd/even level sizes (phantom rows/cols and
    edge pool windows exercise every mask)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.resize import (adaptive_pool_full,
                                             adaptive_pool_full_s2d4,
                                             integral_image)

    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    frames = jnp.asarray(rng.integers(0, 255, size=(2, 80, 100, 3)).astype(np.uint8))
    ii = integral_image(frames[..., ::-1])
    for sh, sw in [(40, 50), (41, 53), (42, 55), (43, 52), (97, 121), (120, 150)]:
        level = M._normalize(adaptive_pool_full(ii, (sh, sw), (80, 100)))
        want = M.PNet(to_pool1=True).apply({"params": params}, level)   # [B,P,Q,10]
        packed4 = M._normalize(adaptive_pool_full_s2d4(ii, (sh, sw), (80, 100)))
        got, (P, Q) = M.pnet_s2d4_stem(params, packed4, (sh, sw))
        assert (P, Q) == want.shape[1:3]
        # unpack got [B,ni,nj,40] -> [B,2ni,2nj,10] and compare the real region
        b, ni, nj, _ = got.shape
        up = np.asarray(got).reshape(b, ni, nj, 2, 2, 10).transpose(0, 1, 3, 2, 4, 5)
        up = up.reshape(b, 2 * ni, 2 * nj, 10)[:, :P, :Q]
        np.testing.assert_allclose(up, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cascade_s2d4_stem_matches_module_path(rng):
    """Full cascade with the fully-packed stem (pnet_stem='s2d4') reproduces
    the module path's detections."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.uint8))

    ref = M.full_forward(params, frames, minsize=14, caps=caps,
                         crop_engine="gather", pnet_stem="module",
                         pnet_tail="module")
    assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
    got = M.full_forward(params, frames, minsize=14, caps=caps,
                         crop_engine="gather", pnet_stem="s2d4")
    v = np.asarray(ref[3])
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
    np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                               rtol=1e-4, atol=1e-4)

def test_pnet_chw_matches_module(rng):
    """The channel-major whole-net formulation (pnet_chw) is tap-identical to
    the module path for both conv1 modes, including odd level sizes (ceil-pool
    edge windows and odd conv output dims)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    for sh, sw in [(12, 12), (13, 17), (24, 31), (27, 26)]:
        x = jnp.asarray(rng.normal(0, 0.5, size=(2, sh, sw, 3)).astype(np.float32))
        want_reg, want_prob = M.PNet().apply({"params": params}, x)
        xc = jnp.transpose(x, (0, 3, 1, 2))
        for mode in ("dot", "fma"):
            cache = {}
            got_reg, got_prob = M.pnet_chw(params, xc, cache=cache, conv1_mode=mode)
            np.testing.assert_allclose(
                np.asarray(jnp.transpose(got_reg, (0, 2, 3, 1))),
                np.asarray(want_reg), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(got_prob), np.asarray(want_prob),
                                       rtol=1e-5, atol=1e-5)
            # second call reuses the cached reshaped weights
            got_reg2, _ = M.pnet_chw(params, xc, cache=cache, conv1_mode=mode)
            np.testing.assert_array_equal(np.asarray(got_reg), np.asarray(got_reg2))


def test_cascade_chw_matches_module_path(rng):
    """Full cascade with the channel-plane PNet (pnet_stem='chw') reproduces
    the module path's detections, including odd frame sizes."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    for fh, fw in [(64, 96), (63, 97)]:
        frames = jnp.asarray(rng.integers(0, 255, size=(1, fh, fw, 3)).astype(np.uint8))
        ref = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", pnet_stem="module",
                             pnet_tail="module")
        assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
        got = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", pnet_stem="chw")
        v = np.asarray(ref[3])
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
        np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                                   rtol=1e-4, atol=1e-4)


def test_cascade_chw_pairing_validated(rng):
    """pnet_stem='chw' only pairs with the chw tail, and the onehot stage-1
    pick is rejected (the chw tail gathers from channel planes)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    frames = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    with pytest.raises(ValueError, match="chw"):
        M.full_forward(params, frames, minsize=14, pnet_stem="chw",
                       pnet_tail="module")
    with pytest.raises(ValueError, match="chw"):
        M.full_forward(params, frames, minsize=14, pnet_stem="module",
                       pnet_tail="chw")
    with pytest.raises(ValueError, match="onehot"):
        M.full_forward(params, frames, minsize=14, pnet_stem="chw",
                       stage1_pick="onehot")


def test_cascade_stacked_stage1_nms_matches_level(rng):
    """stage1_nms='stacked' (one batched [B*L, K] fixpoint over all pyramid
    levels) reproduces the per-level path's detections exactly — the rows
    are independent problems, padded slots are invalid — including odd frame
    sizes and multi-image batches."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=16, cross=64, stage2=48, stage3=24, out=16)
    for bsz, fh, fw in [(1, 64, 96), (2, 63, 97)]:
        frames = jnp.asarray(rng.integers(0, 255, size=(bsz, fh, fw, 3)).astype(np.uint8))
        ref = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", stage1_nms="level")
        assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
        got = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", stage1_nms="stacked")
        v = np.asarray(ref[3])
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
        np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                                   rtol=1e-4, atol=1e-4)
    import pytest
    with pytest.raises(ValueError, match="stage1_nms"):
        M.full_forward(params, jnp.zeros((1, 32, 32, 3), jnp.uint8),
                       minsize=14, stage1_nms="bogus")


def test_pnet_pallas_kernel_matches_module(rng):
    """The fused Pallas PNet kernel (interpret mode) is tap-identical to the
    flax module at f32, including odd level sizes (ceil-pool edges in both
    axes), multi-tile rows, and the phase-split input layout."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.pallas_pnet import (pack_pnet_weights,
                                                  phase_split_level,
                                                  pnet_level)

    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    packed = pack_pnet_weights(params, jnp.float32)
    for sh, sw in [(24, 31), (13, 17), (64, 96), (90, 130)]:
        x = rng.normal(0, 0.5, size=(2, sh, sw, 3)).astype(np.float32)
        want_reg, want_prob = M.PNet().apply({"params": params}, jnp.asarray(x))
        xc = phase_split_level(jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)))
        reg, prob = pnet_level(packed, xc, (sh, sw), to=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(reg), np.asarray(want_reg).transpose(0, 3, 1, 2),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(prob), np.asarray(want_prob),
                                   rtol=1e-5, atol=1e-5)


def test_cascade_pallas_pnet_matches_module_path(rng):
    """Full cascade with the fused Pallas PNet stem (pnet_stem=
    'pallas-interpret', phase-split pyramid pool) reproduces the module
    path's detections, including odd frame sizes."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    for fh, fw in [(64, 96), (63, 97)]:
        frames = jnp.asarray(rng.integers(0, 255, size=(1, fh, fw, 3)).astype(np.uint8))
        ref = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", pnet_stem="module",
                             pnet_tail="module")
        assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
        got = M.full_forward(params, frames, minsize=14, caps=caps,
                             crop_engine="gather", pnet_stem="pallas-interpret")
        v = np.asarray(ref[3])
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
        np.testing.assert_allclose(np.asarray(got[0])[v], np.asarray(ref[0])[v],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got[1])[v], np.asarray(ref[1])[v],
                                   rtol=1e-4, atol=1e-4)


def test_cascade_pallas_mm_pool_matches_gather_pool(rng):
    """pallas_pool='mm' (gather-free row-take + MXU column-matmul pyramid
    pool on <=2-window levels) is BIT-IDENTICAL to the integral-image pool
    through the whole cascade — minsize < 12 makes the top levels upscale,
    so the mm path actually routes, while the small levels still take the
    integral path (mixed routing exercised)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.resize import pool_windows_le2

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    fh, fw = 63, 97
    _, sizes = M.scale_pyramid(fh, fw, 8)
    routed = [pool_windows_le2(s, (fh, fw)) for s in sizes]
    assert any(routed) and not all(routed), routed  # mixed routing
    frames = jnp.asarray(rng.integers(0, 255, size=(1, fh, fw, 3)).astype(np.uint8))
    ref = M.full_forward(params, frames, minsize=8, caps=caps,
                         crop_engine="gather", pnet_stem="pallas-interpret",
                         pallas_pool="gather")
    assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
    got = M.full_forward(params, frames, minsize=8, caps=caps,
                         crop_engine="gather", pnet_stem="pallas-interpret",
                         pallas_pool="mm")
    for r, g in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_chw_stem_fenced_on_tpu(rng, monkeypatch):
    """pnet_stem='chw' reproducibly kills the TPU runtime worker when
    composed over the pyramid (docs/TPU_CRASH_ARMS.md case 1) — on a TPU
    backend the library must refuse it with an actionable error BEFORE
    compile instead of leaving a dead process, unless explicitly
    overridden for runtime re-testing."""
    import pytest

    params = _init_params(rng)
    frames = jnp.asarray(rng.integers(0, 255, size=(1, 48, 64, 3)).astype(np.uint8))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("V2F_ALLOW_TPU_CRASH_ARMS", raising=False)
    with pytest.raises(RuntimeError, match="TPU_CRASH_ARMS"):
        M.full_forward(params, frames, minsize=20, pnet_stem="chw")
    # the documented override re-enables the arm (for newer-runtime retests);
    # on this CPU-backed test the graph must then build and run
    monkeypatch.setenv("V2F_ALLOW_TPU_CRASH_ARMS", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    out = M.full_forward(params, frames, minsize=20, pnet_stem="chw")
    assert out[0].ndim == 3


def test_pnet_pallas_fused_pool_and_r4_bit_identical(rng):
    """The fused-pool kernel (pnet_level_fused: in-kernel row matmul +
    banded column matmuls) is BIT-IDENTICAL to pool-then-pnet_level at
    fixed dot blocking — on upscale AND <=2-window downscale levels, f32
    and bf16. The r4 row-stacked packing is only ULP-EQUIVALENT to r1: the
    inserted zero K-entries change how the dot's f32 accumulation is
    grouped on BOTH backends (measured on chip too — see the TPU-gated
    test below), and the per-dot ulp compounds through the 4 bf16-stored
    layers, so r1-vs-r4 gets a loose sanity bound (docs/ROUND5.md)."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.pallas_pnet import (
        pack_pnet_weights, pack_pnet_weights_r4, pad_frames_chw16,
        pnet_level, pnet_level_fused)
    from videotofaces_tpu.ops.resize import (adaptive_pool_full_chw_phase_mm,
                                             pool_windows_le2)

    pnet = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    h, w = 40, 56
    frames = rng.integers(0, 255, size=(1, h, w, 3)).astype(np.uint8)
    fnorm = jnp.transpose(M._normalize(
        jnp.asarray(frames)[..., ::-1].astype(jnp.float32)), (0, 3, 1, 2))
    f32 = lambda a: np.asarray(a, np.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        packed = pack_pnet_weights(pnet, dt)
        packed4 = pack_pnet_weights_r4(pnet, dt)
        fpad = pad_frames_chw16(fnorm.astype(dt))
        # upscale (windows always <=2) and an exact-3/4 downscale (ratio
        # 4/3: fractional window starts are multiples of 1/3, never > 2/3,
        # so widths stay <=2 — a 0.61x level would have 3-wide windows)
        for sh, sw in [(int(h * 2.4 + 1), int(w * 2.4 + 1)),
                       (h * 3 // 4, w * 3 // 4)]:
            assert pool_windows_le2((sh, sw), (h, w)), (sh, sw)
            lv = adaptive_pool_full_chw_phase_mm(fnorm.astype(dt), (sh, sw),
                                                 (h, w)).astype(dt)
            r1, p1 = pnet_level(packed, lv, (sh, sw), to=8, interpret=True)
            r4, p4 = pnet_level(packed4, lv, (sh, sw), to=8, interpret=True)
            # fused pool vs HBM pool at FIXED impl: exact on any backend
            for pk, (rr, pr) in ((packed, (r1, p1)), (packed4, (r4, p4))):
                r2, p2 = pnet_level_fused(pk, fpad, (h, w), (sh, sw), to=8,
                                          interpret=True)
                np.testing.assert_array_equal(f32(rr), f32(r2))
                np.testing.assert_array_equal(f32(pr), f32(p2))
            # r1 vs r4: loose sanity bound off-MXU — XLA:CPU's dot reduction
            # tree regroups across the zero K-pads, and the per-dot ulp
            # compounds through the 4 bf16-stored layers (~5 ulp observed);
            # bit-exactness holds on chip (TPU test below)
            rtol = 0.05 if dt == jnp.bfloat16 else 1e-4
            atol = 5e-3 if dt == jnp.bfloat16 else 1e-6
            np.testing.assert_allclose(f32(r1), f32(r4), rtol=rtol, atol=atol)
            np.testing.assert_allclose(f32(p1), f32(p4), rtol=rtol, atol=atol)


def test_pnet_r4_and_fused_pool_bit_identical_on_tpu(rng):
    """Compiled-kernel exactness contract ON CHIP (measured, docs/ROUND5.md):
    the fused in-kernel pool is BIT-IDENTICAL to the HBM pool at fixed dot
    blocking in both dtypes; the r4 row-stacked packing is NOT bit-identical
    to r1 — the MXU's padded-K lowering regroups the f32 accumulation at
    ulp level (bf16: ~1 ulp on reg, ~5e-5 on prob; f32: ~1e-7) — so r1-vs-r4
    asserts a tight ulp bound and the production default is r4 EVERYWHERE
    (cross-impl mixing is what would change selections on ties).
    Runs only where a real TPU is attached:
    ``V2F_TEST_PLATFORM=tpu python -m pytest tests/test_models_mtcnn.py -k
    on_tpu`` (the default conftest pins tests to the virtual CPU mesh)."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (MXU accumulate-order assertion)")
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.pallas_pnet import (
        pack_pnet_weights, pack_pnet_weights_r4, pad_frames_chw16,
        pnet_level, pnet_level_fused)
    from videotofaces_tpu.ops.resize import adaptive_pool_full_chw_phase_mm

    pnet = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    h, w = 120, 160
    frames = rng.integers(0, 255, size=(2, h, w, 3)).astype(np.uint8)
    fnorm = jnp.transpose(M._normalize(
        jnp.asarray(frames)[..., ::-1].astype(jnp.float32)), (0, 3, 1, 2))
    f32 = lambda a: np.asarray(a, np.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        packed = pack_pnet_weights(pnet, dt)
        packed4 = pack_pnet_weights_r4(pnet, dt)
        fpad = pad_frames_chw16(fnorm.astype(dt))
        sh, sw = int(h * 1.3 + 1), int(w * 1.3 + 1)
        lv = adaptive_pool_full_chw_phase_mm(fnorm.astype(dt), (sh, sw),
                                             (h, w)).astype(dt)
        r1, p1 = pnet_level(packed, lv, (sh, sw))
        r4, p4 = pnet_level(packed4, lv, (sh, sw))
        rf, pf = pnet_level_fused(packed4, fpad, (h, w), (sh, sw))
        # fused pool vs HBM pool at fixed impl: bit-exact
        np.testing.assert_array_equal(f32(r4), f32(rf))
        np.testing.assert_array_equal(f32(p4), f32(pf))
        # r1 vs r4: ulp-level f32 regrouping (measured maxima + margin)
        if dt == jnp.bfloat16:
            np.testing.assert_allclose(f32(r1), f32(r4), rtol=0.05, atol=2e-3)
            np.testing.assert_allclose(f32(p1), f32(p4), rtol=0, atol=5e-4)
        else:
            np.testing.assert_allclose(f32(r1), f32(r4), rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(f32(p1), f32(p4), rtol=0, atol=1e-5)


def test_cascade_pallas_fused_pool_matches_gather_pool(rng):
    """pallas_pool='fused' (pool inside the kernel) is BIT-IDENTICAL to the
    integral-gather pool through the whole cascade, with mixed level routing
    (small levels keep the integral path) and the r4 dot blocking."""
    import jax
    import jax.numpy as jnp

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.ops.resize import pool_windows_le2

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(2.0)
    caps = M.Caps(pre1=32, post1=32, cross=64, stage2=48, stage3=24, out=16)
    fh, fw = 63, 97
    _, sizes = M.scale_pyramid(fh, fw, 8)
    routed = [pool_windows_le2(s, (fh, fw)) for s in sizes]
    assert any(routed) and not all(routed), routed
    frames = jnp.asarray(rng.integers(0, 255, size=(1, fh, fw, 3)).astype(np.uint8))
    # FIXED impl on both sides (r4, the default) so the comparison isolates
    # the pool routing — r1-vs-r4 exactness is MXU-only (see the TPU test)
    ref = M.full_forward(params, frames, minsize=8, caps=caps,
                         crop_engine="gather", pnet_stem="pallas-interpret",
                         pallas_pool="gather", pnet_impl="r4")
    assert int(np.asarray(ref[3]).sum()) > 0, "no detections — tune test"
    got = M.full_forward(params, frames, minsize=8, caps=caps,
                         crop_engine="gather", pnet_stem="pallas-interpret",
                         pallas_pool="fused", pnet_impl="r4")
    for r, g in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
