"""YOLOv3 face detector (Darknet-53 + FPN-style neck + 3-level head).

Architecture parity target: detectors/yolo.py:17-176 (mmdetection-style YOLOv3
with num_classes=1, WIDER-face weights). TPU redesign:

- whole forward (preprocess -> backbone -> neck -> head -> decode -> NMS) is a
  single jitted graph per static input bucket; frames enter as uint8 NHWC
  (4x less host->device traffic than float)
- the dynamic-size filter/NMS tail (yolo.py:151-175) becomes: sigmoid scores,
  joint (objectness, class-score) mask, top-K selection, fixed-capacity greedy
  NMS per image grouped by class, top-100 output with validity mask
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.anchors import get_priors
from ..ops.boxes import decode_boxes
from ..ops.nms import nms_keep_mask_bucketed_presorted
from ..ops.select import block_topk_select
from ..ops.resize import bilinear_resize_matmul, bilinear_resize_matmul_s2d
from .. import config
from .layers import BatchNormInference, ConvUnit

BASES = [
    (32, [(116, 90), (156, 198), (373, 326)]),
    (16, [(30, 61), (62, 45), (59, 119)]),
    (8, [(10, 13), (16, 30), (33, 23)]),
]


def dconv(cout, k, s=1, name=None):
    return ConvUnit(cout, k, s, p=(k - 1) // 2, activ="lrelu_0.1", bn_eps=1e-5, name=name)


class ResBlock(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        y = dconv(self.c // 2, 1, name="conv1")(x)
        y = dconv(self.c, 3, name="conv2")(y)
        return y + x


class _ConvKernel(nn.Module):
    """Registers a bare conv kernel under the scope name ``conv`` so a
    reformulated conv block keeps ConvUnit's exact param tree
    (<name>/conv/kernel + <name>/bn/*) and stays checkpoint-compatible."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class PackedDown(nn.Module):
    """Darknet's 3x3 stride-2 ConvUnit, computed as space-to-depth + a 2x2
    stride-1 conv over the phase-packed channels.

    XLA's conv emitter runs the large-spatial stride-2 convs far off the MXU
    rate (per-op trace tools/profile_yolo_trace.py: stage1_down 1.85 ms vs a
    ~0.11 ms bf16 roofline, stage2_down 0.54 — the strided input walk defeats
    its lane tiling). Identical taps, different blocking: pack 2x2 spatial
    phases into channels (one relayout of the input at ~HBM rate), scatter
    the 3x3 kernel into a [2, 2, 4*cin, cout] kernel by (tap parity ->
    phase) — zero where a tap falls outside the 3x3 support — and run the
    conv unstrided with top/left padding 1/0 (same construction as
    ``s2d_stem``'s consumption of the packed conv1 output below).

    Param tree matches ConvUnit exactly ([3, 3, cin, cout] kernel + bn):
    checkpoints load unchanged; the packed kernel is rebuilt per forward
    (9 sub-kernel placements on a tiny tensor — negligible next to the
    conv, and it keeps autodiff/loading trivial).

    TPU runtime note: inside the full YOLO graph this composition compiles
    and runs fine (A/B-measured, docs/ROUND4.md); the SAME math STANDALONE
    at the stage1_down shape reproducibly kills the TPU worker process —
    see docs/TPU_CRASH_ARMS.md case 2 and
    tools/repro_tpu_worker_crash.py before microbenching it in isolation.
    """

    cout: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = _ConvKernel((3, 3, cin, self.cout), name="conv")()
        dt = jnp.promote_types(x.dtype, k.dtype)
        x, k = x.astype(dt), k.astype(dt)
        b, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        packed = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        packed = packed.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
        w0 = jnp.zeros((2, 2, 4 * cin, self.cout), k.dtype)
        for pi in (0, 1):
            for r in (0, 1):
                di = 2 * (r - 1) + pi
                if not -1 <= di <= 1:
                    continue
                for pj in (0, 1):
                    for s in (0, 1):
                        dj = 2 * (s - 1) + pj
                        if not -1 <= dj <= 1:
                            continue
                        c0 = (pi * 2 + pj) * cin
                        w0 = w0.at[r, s, c0:c0 + cin].set(k[di + 1, dj + 1])
        y = jax.lax.conv_general_dilated(
            packed, w0, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=config.get_precision())
        y = BatchNormInference(self.cout, 1e-5, name="bn")(y)
        return jnp.where(y >= 0, y, 0.1 * y)


class Darknet53(nn.Module):
    """Returns (C3, C4, C5) at strides (8, 16, 32).

    ``from_stage0``: the input is already the stage0_down ConvUnit's output
    (the space-to-depth stem, ``s2d_stem`` below, computed conv1 AND
    stage0_down outside the module); conv1/stage0_down params still exist in
    checkpoints — flax ignores unvisited subtrees.

    ``packed_downs``: stage indices whose stride-2 down conv runs as the
    tap-identical ``PackedDown`` reformulation (throughput option)."""

    from_stage0: bool = False
    packed_downs: tuple = ()

    @nn.compact
    def __call__(self, x):
        counts = [1, 2, 8, 8, 4]
        chans = [64, 128, 256, 512, 1024]
        if not self.from_stage0:
            x = dconv(32, 3, name="conv1")(x)
        outs = []
        for i, (n, c) in enumerate(zip(counts, chans)):
            if not (self.from_stage0 and i == 0):
                down = (PackedDown(c, name=f"stage{i}_down")
                        if i in self.packed_downs
                        else dconv(c, 3, s=2, name=f"stage{i}_down"))
                x = down(x)
            for j in range(n):
                x = ResBlock(c, name=f"stage{i}_res{j}")(x)
            outs.append(x)
        return outs[2], outs[3], outs[4]


class DetectionBlock(nn.Module):
    cout: int

    @nn.compact
    def __call__(self, x):
        x = dconv(self.cout, 1, name="c0")(x)
        x = dconv(self.cout * 2, 3, name="c1")(x)
        x = dconv(self.cout, 1, name="c2")(x)
        x = dconv(self.cout * 2, 3, name="c3")(x)
        x = dconv(self.cout, 1, name="c4")(x)
        return x


def _upsample2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class YOLOv3Neck(nn.Module):
    """Top-down feature aggregation: detect @32, upsample-concat @16, @8."""

    @nn.compact
    def __call__(self, c3, c4, c5):
        y3 = DetectionBlock(512, name="detect1")(c5)
        t = dconv(256, 1, name="conv1")(y3)
        t = jnp.concatenate([_upsample2(t), c4], axis=-1)
        y2 = DetectionBlock(256, name="detect2")(t)
        t = dconv(128, 1, name="conv2")(y2)
        t = jnp.concatenate([_upsample2(t), c3], axis=-1)
        y1 = DetectionBlock(128, name="detect3")(t)
        return y3, y2, y1


class YOLOv3Head(nn.Module):
    num_classes: int = 1

    @nn.compact
    def __call__(self, y3, y2, y1):
        cout = (self.num_classes + 5) * 3
        maps = []
        for i, (y, cmid) in enumerate(zip((y3, y2, y1), (1024, 512, 256))):
            y = dconv(cmid, 3, name=f"bridge{i}")(y)
            y = nn.Conv(cout, (1, 1), use_bias=True, name=f"pred{i}")(y)
            maps.append(y)
        return maps  # strides (32, 16, 8)


class YOLOv3(nn.Module):
    num_classes: int = 1
    from_stage0: bool = False  # input = s2d_stem output (see Darknet53)
    packed_downs: tuple = ()   # stages whose down conv runs as PackedDown

    @nn.compact
    def __call__(self, x):
        c3, c4, c5 = Darknet53(self.from_stage0, self.packed_downs,
                               name="backbone")(x)
        y3, y2, y1 = YOLOv3Neck(name="neck")(c3, c4, c5)
        return YOLOv3Head(self.num_classes, name="head")(y3, y2, y1)


def _bn_lrelu(x, bn, eps=1e-5, leak=0.1, tile=1):
    """ConvUnit's BatchNormInference + leaky-ReLU on (possibly phase-packed)
    activations; ``tile`` repeats the per-channel params across phases."""
    rep = (lambda v: jnp.tile(v, tile)) if tile > 1 else (lambda v: v)
    x = (x - rep(bn["mean"])) / jnp.sqrt(rep(bn["var"]) + eps) * rep(bn["scale"]) \
        + rep(bn["bias"])
    return jnp.where(x >= 0, x, leak * x)


def s2d_stem(backbone_params, x):
    """Space-to-depth reformulation of Darknet53's first two ConvUnits.

    conv1 (3x3 s1, 3->32) runs at 3/128 input-lane utilization on the MXU
    and stage0_down's full-res input costs a [B, H, W, 32] round trip to
    HBM. Rearranged exactly (same multiplies, different blocking):

    - input -> space-to-depth [B, H/2, W/2, 12] (channel = (row parity,
      col parity, rgb));
    - conv1 becomes a 3x3 conv 12 -> 128 at half resolution, output channel
      = (out row parity, out col parity, original 32) — weights scattered
      by phase, zero where a tap falls outside the original 3x3 support;
    - stage0_down (3x3 s2, 32->64) consumes the PACKED conv1 output as a
      2x2 conv 128 -> 64 with top/left padding 1/0 — the full-resolution
      32-channel tensor is never materialized.

    Returns stage0_down's output [B, H/2, W/2, 64]; feed it to
    ``YOLOv3(from_stage0=True)``. Numerics: identical taps, XLA may
    re-associate accumulation (float-level differences only).

    ``x`` may arrive ALREADY phase-packed as [B, H/2, W/2, 12] (the fused
    resize emits this layout directly — ops/resize.py::
    bilinear_resize_matmul_s2d); the reshape/transpose pack is skipped.
    """
    prec = config.get_precision()
    k1 = backbone_params["conv1"]["conv"]["kernel"]          # [3, 3, 3, 32]
    k0 = backbone_params["stage0_down"]["conv"]["kernel"]    # [3, 3, 32, 64]
    # match flax nn.Conv's dtype promotion for mixed param/input dtypes
    dt = jnp.promote_types(x.dtype, k1.dtype)
    x, k1, k0 = x.astype(dt), k1.astype(dt), k0.astype(dt)
    if x.shape[-1] == 12:
        s2d = x
    else:
        b, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        s2d = x.reshape(b, h // 2, 2, w // 2, 2, 3)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)

    w1 = jnp.zeros((3, 3, 12, 128), k1.dtype)
    for pi in (0, 1):                    # output row parity
        for pr in (0, 1):                # input row parity
            for r in range(3):           # packed kernel row
                di = 2 * r - 2 + pr - pi
                if not -1 <= di <= 1:
                    continue
                for pj in (0, 1):
                    for pc in (0, 1):
                        for s in range(3):
                            dj = 2 * s - 2 + pc - pj
                            if not -1 <= dj <= 1:
                                continue
                            w1 = w1.at[r, s, pr * 6 + pc * 3:pr * 6 + pc * 3 + 3,
                                       pi * 64 + pj * 32:pi * 64 + pj * 32 + 32
                                       ].set(k1[di + 1, dj + 1])
    y = jax.lax.conv_general_dilated(
        s2d, w1, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    y = _bn_lrelu(y, backbone_params["conv1"]["bn"], tile=4)  # packed [.., 128]

    w0 = jnp.zeros((2, 2, 128, 64), k0.dtype)
    for pi in (0, 1):
        for r in range(2):
            di = 2 * (r - 1) + pi
            if not -1 <= di <= 1:
                continue
            for pj in (0, 1):
                for s in range(2):
                    dj = 2 * (s - 1) + pj
                    if not -1 <= dj <= 1:
                        continue
                    w0 = w0.at[r, s, pi * 64 + pj * 32:pi * 64 + pj * 32 + 32
                               ].set(k0[di + 1, dj + 1])
    z = jax.lax.conv_general_dilated(
        y, w0, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return _bn_lrelu(z, backbone_params["stage0_down"]["bn"])


def flat_priors_and_strides(canvas_hw):
    """Concatenated priors [D, 4] and per-candidate strides [D, 1] in the same
    flat order as the head maps (level 32 -> 16 -> 8, row-major, anchor-minor)."""
    per_level = get_priors(canvas_hw, BASES, loc="center", concat=False)
    priors = np.concatenate(per_level)
    strides = np.concatenate([
        np.full((lvl.shape[0], 1), s, np.float32)
        for s, lvl in zip((32, 16, 8), per_level)
    ])
    return priors, strides


def postprocess(maps, priors, strides, num_classes=1, conf_thr=0.005, score_thr=0.05,
                iou_thr=0.45, pre_topk=1000, out_topk=100, per_block=20,
                nms_bucket=256):
    """Fixed-capacity postprocessing for one batch of head maps.

    Candidate semantics match yolo.py:151-175: a candidate is a (location,
    class) pair with objectness >= conf_thr and class score > score_thr; its
    final score is obj * cls; NMS is per image, grouped by class.

    Candidate selection uses block-local top-k with lane-width one-hot payload
    picks (ops/select.py) — full-axis index sorts and per-row gathers cost
    ~12 ms/step on TPU for D=22k; this path costs ~1 ms. Exact unless a
    128-lane block holds > ``per_block`` of the global top-k (returned
    ``overflow`` counts exactly such truncations; the wrapper warns).
    per_block=20 is the 2k-capacity floor block_topk_select enforces for
    k=1000 at D=13k anyway; trace-profiling showed each extra argmax pass
    costs real time (32 -> 20 saved 0.32 ms/batch-8 interleaved median),
    and candidates dense enough to overflow 20-per-128-lanes are flagged
    precisely rather than silently dropped.

    Returns (boxes [B, out_topk, 4] canvas coords, scores, classes, valid,
    overflow [B]).
    """
    b = maps[0].shape[0]
    nc = num_classes
    flat = jnp.concatenate([m.reshape(b, -1, nc + 5) for m in maps], axis=1)  # [B, D, 5+nc]
    d = flat.shape[1]
    reg = flat[..., :4]
    obj = jax.nn.sigmoid(flat[..., 4])
    cls = jax.nn.sigmoid(flat[..., 5:])
    score = cls * obj[..., None]                                   # [B, D, nc]
    ok = (obj[..., None] >= conf_thr) & (cls > score_thr)
    masked = jnp.where(ok, score, 0.0).reshape(b, -1)              # [B, D*nc]

    pre_topk = min(pre_topk, masked.shape[1])
    out_topk = min(out_topk, pre_topk)

    # payload per (location, class) candidate: reg(4) + prior(4) + stride(1) + class(1)
    loc_payload = jnp.concatenate([
        reg,
        jnp.broadcast_to(priors[None], (b, d, 4)),
        jnp.broadcast_to(strides[None], (b, d, 1)),
    ], axis=-1)                                                    # [B, D, 9]
    if nc > 1:
        loc_payload = jnp.repeat(loc_payload, nc, axis=1)
    class_col = jnp.broadcast_to(
        jnp.tile(jnp.arange(nc, dtype=jnp.float32), (d,))[None, :, None],
        (b, d * nc, 1))
    payload = jnp.concatenate([loc_payload, class_col], axis=-1)   # [B, D*nc, 10]

    top_scores, sel, overflow = block_topk_select(masked, payload, pre_topk, per_block)
    valid = top_scores > 0.0
    boxes = decode_boxes(sel[..., 0:4], sel[..., 4:8], mode="yolo",
                         strides=sel[..., 8:9])                    # [B, K, 4]
    class_id = sel[..., 9].astype(jnp.int32)

    # block_topk_select emits descending order with the valid slots as a
    # prefix, so quiet batches route through a [nms_bucket, nms_bucket] NMS
    # problem (exact; scalar cond on the batch-max valid count) instead of
    # always paying the [pre_topk, pre_topk] capacity cost
    keep = nms_keep_mask_bucketed_presorted(
        boxes, valid, iou_thr, group_ids=class_id,
        bucket=pre_topk if nms_bucket is None else nms_bucket)

    # final top-out_topk among kept: one short variadic sort with payload
    key = -jnp.where(keep, top_scores, 0.0)
    ops = (key,) + tuple(boxes[..., i] for i in range(4)) + (sel[..., 9],)
    sorted_ops = jax.lax.sort(ops, dimension=-1, num_keys=1)
    out_scores = -sorted_ops[0][:, :out_topk]
    out_boxes = jnp.stack(sorted_ops[1:5], axis=-1)[:, :out_topk]
    out_classes = sorted_ops[5][:, :out_topk].astype(jnp.int32)
    out_valid = out_scores > 0.0
    return out_boxes, out_scores, out_classes, out_valid, overflow


def full_forward(params, frames_u8, resized_hw, canvas_hw, priors, strides,
                 num_classes=1, out_topk=100, orig_hw=None, compute_dtype=None,
                 s2d=False, packed_downs=(), raw_maps=False):
    """uint8 BGR frames -> final detections, one jitted graph.

    Mirrors YOLOv3.forward (yolo.py:139-147): keep-ratio resize to 608 max
    side, /255 normalization, RGB order, zero-pad to /32 canvas, forward,
    postprocess, rescale boxes to original frame coordinates.

    ``orig_hw``: if given, frames are ALREADY resized to ``resized_hw`` on host
    (bit-parity cv2 INTER_LINEAR path) and only normalized/padded here.

    ``raw_maps``: return the f32 head maps before postprocess (candidate-
    density probes, e.g. tools/bench_density.py).
    """
    if orig_hw is None:
        h, w = frames_u8.shape[1:3]
    else:
        h, w = orig_hw
    nh, nw = resized_hw
    if compute_dtype is not None and orig_hw is None:
        # Throughput mode: resize FIRST, straight from uint8, landing on the
        # /32 canvas via zero-padded interpolation matrices (the pad step
        # comes free out of the second matmul). BGR->RGB and /255 are
        # channel/scalar ops that commute with the spatial resize and run
        # on the small canvas tensor instead of full-res. XLA fuses the
        # u8->f32 convert into the einsum reads, so the [B, 1080, 1920, 3]
        # f32 tensor is never materialized (that materialization alone
        # costs ~3 ms/batch-8; see tools/profile_preprocess.py).
        if s2d:
            # fused resize -> space-to-depth: the interpolation matrices are
            # parity-split so the four quarter-res phase canvases fall out of
            # the matmuls directly — the full-res canvas, its bf16 convert,
            # and the stem's reshape/transpose pack (~1.9 ms/batch-8 of pure
            # relayout in the per-op trace) never exist
            x = bilinear_resize_matmul_s2d(
                frames_u8, (nh, nw), canvas_hw).astype(compute_dtype)
        else:
            x = bilinear_resize_matmul(frames_u8, (nh, nw), canvas_hw=canvas_hw)
            x = (x[..., ::-1] / 255.0).astype(compute_dtype)
    else:
        x = frames_u8[..., ::-1].astype(jnp.float32)  # BGR -> RGB
        if orig_hw is None:
            x = bilinear_resize_matmul(x, (nh, nw))
        x = x / 255.0
        x = jnp.pad(x, ((0, 0), (0, canvas_hw[0] - nh), (0, canvas_hw[1] - nw), (0, 0)))
        if compute_dtype is not None:
            # bf16 params + bf16 activations: native-dtype MXU passes,
            # halved weight streaming; measured ~16% faster, identical
            # detections
            x = x.astype(compute_dtype)
    if s2d:
        # space-to-depth stem: same taps, MXU-friendly blocking (s2d_stem)
        x = s2d_stem(params["backbone"], x)
    maps = YOLOv3(num_classes, from_stage0=s2d,
                  packed_downs=tuple(packed_downs)).apply({"params": params}, x)
    maps = [t.astype(jnp.float32) for t in maps]
    if raw_maps:
        return maps
    boxes, scores, classes, valid, overflow = postprocess(
        maps, priors, strides, num_classes, out_topk=out_topk)
    scale = jnp.asarray([w / nw, h / nh, w / nw, h / nh], jnp.float32)
    return boxes * scale, scores, classes, valid, overflow


def resized_shape(h, w, max_side=608):
    scl = min(max_side / min(h, w), max_side / max(h, w))
    return int(h * scl + 0.5), int(w * scl + 0.5)


def canvas_shape(nh, nw, mult=32):
    return (-(-nh // mult) * mult, -(-nw // mult) * mult)


def torch_spec(num_classes=1):
    """Ordered checkpoint spec matching the torch reference's registration
    order (detectors/yolo.py:34-120): Darknet53, neck, head (bridges then
    preds). Used by tools/convert_weights.py for the positional .pt remap."""
    from ..utils import weights as W

    els = []
    els += W.convunit("backbone/conv1")
    for i, n in enumerate([1, 2, 8, 8, 4]):
        els += W.convunit(f"backbone/stage{i}_down")
        for j in range(n):
            els += W.convunit(f"backbone/stage{i}_res{j}/conv1")
            els += W.convunit(f"backbone/stage{i}_res{j}/conv2")
    for block, cv in [("detect1", "conv1"), ("detect2", "conv2"), ("detect3", None)]:
        for c in range(5):
            els += W.convunit(f"neck/{block}/c{c}")
        if cv:
            els += W.convunit(f"neck/{cv}")
    for i in range(3):
        els += W.convunit(f"head/bridge{i}")
    for i in range(3):
        els.append(W.conv(f"head/pred{i}", bias=True))
    return els
