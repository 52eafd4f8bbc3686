"""Conversion-spec proofs against the REFERENCE'S OWN torch modules.

The reference loads checkpoints by positional state-dict remap
(/root/reference/src/videotofaces/utils/weights.py:35-48): source tensor
order must equal target module registration order. Our converter
(utils/weights.py::convert_state + each model's torch_spec) relies on the
same ordering contract, but until now it was only verified against torch
models the repo itself defines — a shared misordering would pass.

These tests close that gap without network access: import the reference
package itself (torchvision stubbed — only its NMS/RoI ops are referenced,
and only inside forward paths we don't call), instantiate each real module,
seed-randomize its state dict, push the ordered tensors through our spec
conversion, and assert the flax forward matches the reference module's
forward to <= 1e-4. A single transposed pair anywhere in a spec fails the
corresponding test.

FaceNet VGG and CASIA checkpoints share one architecture/spec
(encoders/facenet.py:157-176 differ only in weight values), so one module
test covers both; the checkpoint-level reorder hooks (AnimeFRCNN.wconv,
AnimeVIT.wconv, FaceNet.no_classify) are proven equivalent to our converter
reorders separately in test_checkpoint_reorders_match_reference.
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip(
    "torch", reason="spec-vs-reference proofs need torch to run the "
                    "reference's own modules")

REF_SRC = "/root/reference/src"

if not osp.isdir(osp.join(REF_SRC, "videotofaces")):
    pytest.skip("reference checkout not present at %s — these proofs can "
                "only run where the upstream source is mounted" % REF_SRC,
                allow_module_level=True)


def _install_reference():
    """Stub torchvision (absent in this env; the reference imports it at
    module scope but we never call the stubbed ops) and import the
    reference package."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        def _unused(*a, **k):
            raise RuntimeError("torchvision stub: not callable in these tests")

        ops.batched_nms = _unused
        ops.roi_align = _unused
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)


_install_reference()

from videotofaces_tpu.utils import weights as W  # noqa: E402


def _randomize(module, seed, scale=0.05):
    """Seed-randomize every tensor so the parity check is non-trivial;
    running_var must stay positive (BN inference divides by it)."""
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k in sd:
        if sd[k].ndim == 0:
            continue  # num_batches_tracked
        t = torch.randn(sd[k].shape, generator=gen) * scale
        if k.endswith("running_var"):
            t = t.abs() + 0.5
        sd[k] = t
    module.load_state_dict(sd)
    module.eval()
    return sd


def _ordered_tensors(sd):
    return [np.asarray(v.float().numpy()) for v in sd.values()]


def _spec_tensor_count(spec):
    n = 0
    for el in spec:
        kind = el[0]
        if kind == "conv":
            n += 2 if el[2] else 1
        elif kind == "bn":
            n += 4
        elif kind == "linear":
            n += 2 if el[2] else 1
        elif kind == "linear_reshaped":
            n += 2 if el[4] else 1
        elif kind == "ln":
            n += 2
        elif kind == "param":
            n += 1
        else:
            raise AssertionError(kind)
    return n


def _convert(spec, sd):
    """Count-checked conversion: the spec must consume exactly the module's
    non-scalar tensors, in registration order."""
    tensors = _ordered_tensors(sd)
    n_src = sum(1 for t in tensors if t.ndim > 0)
    assert _spec_tensor_count(spec) == n_src, \
        f"spec consumes {_spec_tensor_count(spec)} tensors, module has {n_src}"
    return W.unflatten(W.convert_state(spec, tensors))


def _nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _close(got, want_t, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(got), want_t.detach().numpy(),
                               atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------


def test_mtcnn_spec_vs_reference(rng):
    """All three cascade nets: detectors/mtcnn.py:12-131 registration order,
    including RNet/ONet's permute(0,3,2,1) flatten before the dense heads."""
    from videotofaces.detectors.mtcnn import MTCNN as RefMTCNN

    from videotofaces_tpu.models import mtcnn as M

    ref = RefMTCNN("cpu")
    sd = _randomize(ref, seed=10)
    tree = _convert(M.torch_spec(), sd)

    x = rng.normal(0, 0.5, size=(2, 3, 26, 20)).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = ref.pnet(torch.from_numpy(x))
    reg, prob = M.PNet().apply({"params": tree["pnet"]}, _nhwc(x))
    _close(np.transpose(np.asarray(reg), (0, 3, 1, 2)), reg_t)
    _close(prob, prob_t)

    x = rng.normal(0, 0.5, size=(3, 3, 24, 24)).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = ref.rnet(torch.from_numpy(x))
    reg, prob = M.RNet().apply({"params": tree["rnet"]}, _nhwc(x))
    _close(reg, reg_t)
    _close(prob, prob_t)

    x = rng.normal(0, 0.5, size=(3, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        reg_t, lmk_t, prob_t = ref.onet(torch.from_numpy(x))
    reg, lmk, prob = M.ONet().apply({"params": tree["onet"]}, _nhwc(x))
    _close(reg, reg_t)
    _close(lmk, lmk_t)
    _close(prob, prob_t)


def test_yolo_spec_vs_reference(rng):
    """Darknet53 + neck + head raw prediction maps (detectors/yolo.py:34-137
    registration order, 366 non-scalar tensors)."""
    from videotofaces.detectors.yolo import YOLOv3 as RefYOLO

    from videotofaces_tpu.models import yolo as Y

    ref = RefYOLO("cpu")
    sd = _randomize(ref, seed=11)
    tree = _convert(Y.torch_spec(1), sd)

    x = rng.normal(0, 0.5, size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        maps_t = ref.head(ref.neck(ref.backbone(torch.from_numpy(x))))
    maps = Y.YOLOv3(1).apply({"params": tree}, _nhwc(x))
    assert len(maps) == len(maps_t) == 3  # strides 32, 16, 8
    for m, mt in zip(maps, maps_t):
        _close(np.transpose(np.asarray(m), (0, 3, 1, 2)), mt)


def test_rcnn_spec_vs_reference(rng):
    """ResNet50 body + FPN + RPN heads + RoI head (detectors/rcnn.py:126-139
    registration order — body, laterals THEN smooths, rpn conv/log/reg,
    roi fc0/fc1/cls/reg — which is also AnimeFRCNN.wconv's output order)."""
    from videotofaces.detectors.rcnn import FasterRCNN as RefRCNN

    from videotofaces_tpu.models import rcnn as R

    ref = RefRCNN("cpu")
    sd = _randomize(ref, seed=12)
    body_spec, head_spec = R.torch_spec()
    tree = _convert(body_spec + head_spec, sd)
    head_paths = {el[1].split("/")[0] for el in head_spec}
    body = {k: v for k, v in tree.items() if k not in head_paths}
    head = {k: v for k, v in tree.items() if k in head_paths}

    x = rng.normal(0, 0.5, size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        feats_t = ref.body(torch.from_numpy(x))
        pyr_t = ref.fpn(feats_t)
        rpn_t = [ref.rpn.head(p) for p in pyr_t]
    pyramid, regs, logs = R.FasterRCNN(1).apply({"params": body}, _nhwc(x))
    assert len(pyramid) == len(pyr_t) == 5
    for p, pt in zip(pyramid, pyr_t):
        _close(np.transpose(np.asarray(p), (0, 3, 1, 2)), pt)
    for (reg, log), (reg_t, log_t) in zip(zip(regs, logs), rpn_t):
        _close(reg, reg_t)
        _close(log, log_t.squeeze(-1))

    # RoI head consumes flattened 7x7x256 maps: NCHW vs NHWC flatten order
    # differs, handled by linear_reshaped's (1, 2, 0) permute
    rm = rng.normal(0, 0.5, size=(5, 256, 7, 7)).astype(np.float32)
    with torch.no_grad():
        reg_t, cls_t = ref.roi.heads(torch.from_numpy(rm))
    reg, cls = R.RoIHead(1).apply({"params": head}, _nhwc(rm))
    _close(reg, reg_t)
    _close(cls, cls_t)


def test_facenet_spec_vs_reference(rng):
    """Full InceptionResnetV1 forward (encoders/facenet.py:123-154
    registration order, 602 non-scalar tensors; VGG and CASIA checkpoints
    share this architecture so one order proof covers both)."""
    from videotofaces.encoders.facenet import InceptionResnetV1 as RefFaceNet

    from videotofaces_tpu.models import facenet as FN

    ref = RefFaceNet("cpu")
    sd = _randomize(ref, seed=13)
    tree = _convert(FN.torch_spec(), sd)

    x = rng.normal(0, 0.5, size=(2, 3, 160, 160)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = FN.InceptionResnetV1().apply({"params": tree}, _nhwc(x))
    _close(got, want)


@pytest.mark.parametrize("dim,depth", [(768, 12), (1024, 24)],
                         ids=["b16", "l16"])
def test_vit_spec_vs_reference(rng, dim, depth):
    """Full ViT forward for both B16 and L16 geometries
    (encoders/vit.py:80-102 registration order: class token, pos embedding,
    patch conv, then per-block norm1/q/k/v/proj/norm2/fc1/fc2, final norm)."""
    from videotofaces.encoders.vit import ViT as RefViT

    from videotofaces_tpu.models import vit as V

    ref = RefViT("cpu", 128, 16, dim, depth)
    sd = _randomize(ref, seed=14 + depth)
    tree = _convert(V.torch_spec(depth), sd)

    x = rng.normal(0, 0.5, size=(2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = V.ViT(img_size=128, patch_size=16, dim=dim, depth=depth).apply(
        {"params": tree}, _nhwc(x))
    _close(got, want)


def test_checkpoint_reorders_match_reference():
    """The checkpoint-level key reorders (mmdet RoI swap, AnimeVIT CLIP-key
    reshuffle+skip, FaceNet logits drop) must transform any pattern-matching
    key sequence exactly like the reference's wconv hooks
    (rcnn.py:159-166, vit.py:112-127, facenet.py:165-168)."""
    from videotofaces.detectors.rcnn import AnimeFRCNN
    from videotofaces.encoders.facenet import FaceNet as RefFaceNetWrap
    from videotofaces.encoders.vit import AnimeVIT

    sys.path.insert(0, "/root/repo/tools")
    import convert_weights as CW

    # mmdet Faster R-CNN: last 8 entries [cls w/b, reg w/b, fc0 w/b, fc1 w/b]
    # -> [fc..., cls/reg...]
    src = {f"body.{i}": torch.tensor([float(i)]) for i in range(12)}
    for k in ("fc_cls.weight", "fc_cls.bias", "fc_reg.weight", "fc_reg.bias",
              "shared_fcs.0.weight", "shared_fcs.0.bias",
              "shared_fcs.1.weight", "shared_fcs.1.bias"):
        src["roi_head." + k] = torch.tensor([1.0])
    want = list(AnimeFRCNN.wconv(AnimeFRCNN.__new__(AnimeFRCNN), dict(src)))
    got = [k for k, _ in CW.mmdet_roi_reorder(list(src.items()))]
    assert got == want

    # AnimeVIT: CLIP-style source (norms AFTER the weights they govern,
    # positional embedding after the patch conv, plus text/decoder/mlm/fc
    # heads to skip) -> module registration order
    src = {"model.class_token": 0, "model.patch_embedding.weight": 0,
           "model.patch_embedding.bias": 0, "model.positional_embedding": 0,
           "text_embeddings.tok.weight": 0}
    for i in range(3):
        for part in ("attn.proj_q", "attn.proj_k", "attn.proj_v", "attn.proj"):
            src[f"model.blocks.{i}.{part}.weight"] = 0
            src[f"model.blocks.{i}.{part}.bias"] = 0
        src[f"model.blocks.{i}.norm1.weight"] = 0
        src[f"model.blocks.{i}.norm1.bias"] = 0
        for part in ("pwff.fc1", "pwff.fc2"):
            src[f"model.blocks.{i}.{part}.weight"] = 0
            src[f"model.blocks.{i}.{part}.bias"] = 0
        src[f"model.blocks.{i}.norm2.weight"] = 0
        src[f"model.blocks.{i}.norm2.bias"] = 0
    src.update({"model.norm.weight": 0, "model.norm.bias": 0,
                "decoder.layer.weight": 0, "mlm_head.fc.weight": 0,
                "model.fc.weight": 0, "class_head.1.weight": 0})
    want = list(AnimeVIT.wconv(AnimeVIT.__new__(AnimeVIT), dict(src)))
    got = [k for k, _ in CW.anime_vit_reorder(list(src.items()), depth=3)]
    assert got == want

    # FaceNet: drop the classifier head
    src = {"stem.0.conv.weight": 0, "logits.weight": 0, "logits.bias": 0,
           "main.9.bias": 0}
    want = list(RefFaceNetWrap.no_classify(
        RefFaceNetWrap.__new__(RefFaceNetWrap), dict(src)))
    got = [k for k, _ in CW.facenet_drop_logits(list(src.items()))]
    assert got == want


def test_convert_weights_parses_real_torch_save_files(rng, tmp_path):
    """Byte-level .pt parse proof (VERDICT r4 item 8): run the OFFLINE
    converter end to end on real ``torch.save`` ZIPFILES (not in-memory
    state dicts) — the exact artifact the pretrained downloads produce —
    and assert the written .npz equals the in-memory conversion.

    Covers both container shapes the checkpoints use: a bare state dict
    (MTCNN, facenet-pytorch style) and an mmdet-style
    ``{"state_dict": ..., "meta": ...}`` wrapper that also needs the
    ``sub=`` key and the RoI-head reorder (reference rcnn.py:154-166)."""
    from videotofaces.detectors.mtcnn import MTCNN as RefMTCNN
    from videotofaces.detectors.rcnn import AnimeFRCNN

    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.models import rcnn as R

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
    import convert_weights as CW

    # --- MTCNN: bare state dict saved as a real torch.save zipfile --------
    ref = RefMTCNN("cpu")
    sd = _randomize(ref, seed=41)
    pt = tmp_path / "mtcnn_joined.pt"
    torch.save(sd, str(pt))
    out = tmp_path / "mtcnn_joined.npz"
    CW.convert("mtcnn", str(pt), str(out))
    got = W.load_params(str(out))
    want = _convert(M.torch_spec(), sd)
    gf, wf = W.flatten(W._to_numpy_tree(got)), W.flatten(W._to_numpy_tree(want))
    assert sorted(gf) == sorted(wf)
    for k in wf:
        np.testing.assert_array_equal(gf[k], wf[k], err_msg=k)

    # --- RCNN: mmdet-style {"state_dict": ...} wrapper + RoI reorder ------
    # the real checkpoint stores the RoI cls/reg FCs BEFORE the shared FCs;
    # build that ordering by inverting the reference's wconv on a
    # registration-ordered dict (wconv moves the last 8: [cls/reg, fc] ->
    # [fc, cls/reg]; the inverse moves [fc, cls/reg] -> [cls/reg, fc])
    from videotofaces.detectors.rcnn import FasterRCNN as RefFRCNN

    ref_r = RefFRCNN("cpu")
    sd_r = _randomize(ref_r, seed=42)
    items = list(sd_r.items())
    mmdet_items = items[:-8] + items[-4:] + items[-8:-4]
    # round-trip sanity: the converter's reorder must restore registration order
    assert [k for k, _ in CW.mmdet_roi_reorder(mmdet_items)] == [k for k, _ in items]
    import collections
    mmdet_sd = collections.OrderedDict(mmdet_items)
    pt_r = tmp_path / "frcnn_anime.pth"
    torch.save({"state_dict": mmdet_sd, "meta": {"mmdet_version": "2.x"}}, str(pt_r))
    out_r = tmp_path / "frcnn_anime.npz"
    CW.convert("rcnn", str(pt_r), str(out_r))
    got_r = W.load_params(str(out_r))
    body_spec, head_spec = R.torch_spec()
    flat_all = W.convert_state(body_spec + head_spec, _ordered_tensors(sd_r))
    head_paths = {el[1] for el in head_spec}
    want_flat = {("head/" if k.split("/")[0] in head_paths else "body/") + k: v
                 for k, v in flat_all.items()}
    got_flat = W.flatten(W._to_numpy_tree(got_r))
    assert sorted(got_flat) == sorted(want_flat)
    for k in want_flat:
        np.testing.assert_array_equal(got_flat[k], np.asarray(want_flat[k]),
                                      err_msg=k)
