"""User-facing model wrappers: hold params, manage jit caches per input bucket,
and expose the reference's callable API (list of BGR numpy frames in, per-image
numpy detections/embeddings out).

Weights resolution: converted .npz checkpoints from <repo>/weights (see
tools/convert_weights.py). When a checkpoint is absent (e.g. offline/CI), the
wrapper falls back to seeded random initialization with a loud note — every
compute path still runs identically, only the predictions are untrained.
"""

import os.path as osp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.anchors import get_priors
from ..utils import weights as W
from . import yolo as Y


def _resolve_checkpoint(checkpoint, expected):
    """Load <weights_dir>/<checkpoint>.npz against an ``expected`` param tree
    (shape/name checked), falling back to the tree itself (seeded random
    init) with a loud note when the file is absent."""
    path = osp.join(W.weights_dir(), checkpoint + ".npz")
    if osp.isfile(path):
        print("Using weights from: " + path)
        return W.load_params(path, expected=expected)
    print("NOTE: no converted weights at %s — using seeded random init "
          "(run tools/convert_weights.py with the torch checkpoint for real weights)" % path)
    return expected


def _resolve_params(model, example, checkpoint):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    return _resolve_checkpoint(checkpoint, variables["params"])


def _jit_fwd(fn, mesh, n_batch_args=1):
    """jit a (params, *batches) -> batched-outputs fn, optionally SPMD over a
    1-axis 'data' mesh: params replicated, the batch args and outputs sharded
    on their leading axis. XLA partitions the whole graph (model +
    postprocess)."""
    if mesh is None:
        return jax.jit(fn)
    from ..parallel.mesh import batch_sharding, replicated

    return jax.jit(fn,
                   in_shardings=(replicated(mesh),) + (batch_sharding(mesh),) * n_batch_args,
                   out_shardings=batch_sharding(mesh))


def _round_batch(bs, mesh):
    if mesh is None:
        return bs
    n = mesh.shape["data"]
    return -(-bs // n) * n


def prefetch_handle(handle):
    """Start async D2H copies for every device-array leaf of a ``submit``
    handle. The pipeline calls this right after submit so the result bytes
    travel while the device runs the NEXT batches and the host post-processes
    OLDER ones; ``collect``'s device_get then completes near-instantly.
    Without it every collect pays the full D2H round trip on the critical
    path (measured on the dev tunnel: 33.7 -> 8.1 ms/batch-8 at queue depth
    8, tools/profile_pipeline.py)."""
    for leaf in jax.tree.leaves(handle):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()


def pad_batch(frames, batch_size):
    """Stack a list of same-shape frames, padding to ``batch_size`` by repeating
    the last frame (results for the padding are dropped)."""
    n = len(frames)
    arr = np.stack(frames)
    if n < batch_size:
        pad = np.repeat(arr[-1:], batch_size - n, axis=0)
        arr = np.concatenate([arr, pad])
    return arr, n


class _BoxDetectorBase:
    """Shared submit/collect for detectors whose graph returns
    (boxes, scores, classes, valid[, select_overflow[, roi_dropped[,
    roi_truncated]]]) — YOLO (5 leaves) and Faster R-CNN (7: the
    pallas-RoIAlign drop and truncation counters are separate so each
    warning names the right remediation). Subclasses provide ``_name``,
    ``_resized_hw(h, w)`` and ``_compiled(b, h, w)``."""

    def _resized_hw(self, h, w):
        raise NotImplementedError

    def submit(self, frames):
        """Dispatch a batch asynchronously; pair with ``collect``. Lets the
        pipeline overlap device compute with host post-processing."""
        frames = list(frames)
        h, w = frames[0].shape[:2]
        if self.host_resize:
            import cv2

            nh, nw = self._resized_hw(h, w)
            frames = [cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
                      for f in frames]
        bs = _round_batch(self.batch_size or len(frames), self.mesh)
        arr, n = pad_batch(frames, bs)
        fn = self._compiled(arr.shape[0], h, w)
        return fn(self.params, jnp.asarray(arr)), n

    prefetch = staticmethod(prefetch_handle)

    def collect(self, handle):
        # ONE device_get over every leaf: a second fetch for the overflow
        # counter would pay a second D2H round trip per batch (measured
        # 64.5 -> 33.7 ms/batch-8 on the dev tunnel, tools/profile_pipeline.py)
        fetched = jax.device_get(handle[0])
        n = handle[1]
        boxes, scores, classes, valid = fetched[:4]
        if len(fetched) > 4:  # block-select truncation-risk counter
            of = int(np.asarray(fetched[4]).max())
            if of > 0:
                print("WARNING: %s candidate block-select may have truncated "
                      "up to %d lane block(s) per image (batch max; spatially "
                      "dense detections); raise per_block in postprocess for "
                      "exact selection." % (self._name, of))
        if len(fetched) > 5:  # pallas-RoIAlign big-bucket drop counter
            dr = int(np.asarray(fetched[5]).max())
            if dr > 0:
                print("WARNING: %s pallas RoIAlign dropped up to %d "
                      "low-scoring big-window roi(s) per image (batch max; "
                      "big-bucket overflow); raise big_cap or use "
                      "roi_method='dense'." % (self._name, dr))
        if len(fetched) > 6:  # pallas-RoIAlign truncated-window counter
            tr = int(np.asarray(fetched[6]).max())
            if tr > 0:
                print("WARNING: %s pallas RoIAlign ran up to %d degenerate-"
                      "aspect roi(s) per image (batch max) with a TRUNCATED "
                      "sampling window (outside samples contribute zero); "
                      "use roi_method='dense' for exact pooling."
                      % (self._name, tr))
        out_b, out_s, out_c = [], [], []
        for i in range(n):
            v = valid[i]
            out_b.append(boxes[i][v])
            out_s.append(scores[i][v])
            out_c.append(classes[i][v])
        return out_b, out_s, out_c

    def __call__(self, frames):
        return self.collect(self.submit(frames))


class YoloDetector(_BoxDetectorBase):
    """Live-action face detector; reference API parity with RealYOLO
    (yolo.py:179-191): __call__(list of BGR frames) -> (boxes, scores, classes)
    as per-image numpy lists."""

    _name = "YOLO"

    def __init__(self, device=None, checkpoint="yolov3_wider", max_side=608,
                 batch_size=None, params=None, mesh=None, host_resize=False,
                 bf16=False, s2d=None):
        print("Initializing YOLOv3 model for live-action face detection")
        del device  # jax manages placement
        self.mesh = mesh
        self.host_resize = host_resize  # cv2 fixed-point resize (bit parity)
        self.compute_dtype = jnp.bfloat16 if bf16 else None
        # space-to-depth stem (models/yolo.py::s2d_stem): same taps, better
        # MXU blocking; interleaved A/B 11.34 -> 10.61 ms/batch-8 1080p.
        # Default on in bf16 throughput mode; parity mode keeps the module
        # graph (reassociated accumulation can flip borderline detections)
        self.s2d = bf16 if s2d is None else s2d
        self.model = Y.YOLOv3(num_classes=1)
        self.max_side = max_side
        self.batch_size = batch_size
        if params is None:
            params = _resolve_params(self.model, jnp.zeros((1, 64, 64, 3)), checkpoint)
        if bf16:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        self.params = params
        self._cache = {}

    def _compiled(self, b, h, w):
        key = (b, h, w)
        if key not in self._cache:
            nh, nw = Y.resized_shape(h, w, self.max_side)
            canvas = Y.canvas_shape(nh, nw)
            priors, strides = Y.flat_priors_and_strides(canvas)
            fn = _jit_fwd(partial(
                Y.full_forward,
                resized_hw=(nh, nw), canvas_hw=canvas,
                priors=jnp.asarray(priors), strides=jnp.asarray(strides),
                orig_hw=(h, w) if self.host_resize else None,
                compute_dtype=self.compute_dtype, s2d=self.s2d), self.mesh)
            self._cache[key] = fn
        return self._cache[key]

    def _resized_hw(self, h, w):
        return Y.resized_shape(h, w, self.max_side)


class _Encoder:
    """Shared encoder wrapper: resize to the model's square input (the
    cv2.blobFromImages step), normalize, forward, padded batches.

    ``device_resize=True`` moves the resize itself on-device via the fused
    Pallas kernel (ops/pallas_resize.py) — images ship as packed uint8 and the
    host does no per-image work; numerics differ from cv2's fixed-point
    INTER_LINEAR by <1 LSB. Default False = bit-parity host cv2 path."""

    def __init__(self, model, checkpoint, input_size, preprocess, params=None,
                 batch_size=None, mesh=None, device_resize=False, pack_size=256):
        self.model = model
        self.mesh = mesh
        self.input_size = input_size
        self.preprocess = preprocess
        self.batch_size = batch_size
        self.device_resize = device_resize
        self.pack_size = pack_size
        self.norm_scale = 1 / 128.0   # overridden per encoder
        self.norm_mean = 127.5
        if params is None:
            params = _resolve_params(model, jnp.zeros((1, input_size, input_size, 3)),
                                     checkpoint)
        self.params = params
        self._fn_cache = {}

    def _compiled(self, b):
        if b not in self._fn_cache:
            prep = self.preprocess

            def fwd(params, u8_bgr):
                x = prep(u8_bgr[..., ::-1])  # BGR -> RGB, affine normalize
                return self.model.apply({"params": params}, x)

            self._fn_cache[b] = _jit_fwd(fwd, self.mesh)
        return self._fn_cache[b]

    def _compiled_packed(self, b):
        key = ("packed", b)
        if key not in self._fn_cache:
            from ..ops import pallas_resize as PRZ

            size = self.input_size
            scale, mean = self.norm_scale, self.norm_mean

            def fwd(params, packed_chw, sizes):
                x = PRZ.resize_normalize_chw_u8(packed_chw, sizes, size,
                                                scale, mean, swap_rb=True)
                return self.model.apply({"params": params}, x)

            # both packed images and their sizes shard on the batch axis, so
            # device_resize composes with data parallelism
            self._fn_cache[key] = _jit_fwd(fwd, self.mesh, n_batch_args=2)
        return self._fn_cache[key]

    def __call__(self, images):
        import cv2

        if self.device_resize:
            from ..ops import pallas_resize as PRZ

            packed, sizes = PRZ.pack_images(list(images), self.pack_size)
            bs = _round_batch(self.batch_size or len(images), self.mesh)
            n = len(images)
            if packed.shape[0] < bs:
                pad = np.repeat(packed[-1:], bs - n, axis=0)
                packed = np.concatenate([packed, pad])
                sizes = np.concatenate([sizes, np.repeat(sizes[-1:], bs - n, axis=0)])
            out = self._compiled_packed(bs)(self.params, jnp.asarray(packed),
                                            jnp.asarray(sizes))
            return np.asarray(jax.device_get(out))[:n]

        s = self.input_size
        blobs = [cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
                 for img in images]
        bs = _round_batch(self.batch_size or len(blobs), self.mesh)
        arr, n = pad_batch(blobs, bs)
        out = self._compiled(arr.shape[0])(self.params, jnp.asarray(arr))
        return np.asarray(jax.device_get(out))[:n]


class FaceNetEncoder(_Encoder):
    """Live-action face embedder; parity with FaceNet (facenet.py:157-183)."""

    def __init__(self, device=None, casia=False, **kw):
        from . import facenet as FN

        src = "casia" if casia else "vgg"
        print("Initializing FaceNet %s model for live-action face encoding" % src.upper())
        del device
        super().__init__(FN.InceptionResnetV1(), "facenet_" + src, 160,
                         FN.preprocess_uint8, **kw)
        self.norm_scale, self.norm_mean = 1 / 128.0, 127.5  # facenet.py:179 affine


class VitEncoder(_Encoder):
    """Anime face embedder; parity with AnimeVIT (vit.py:105-146)."""

    def __init__(self, device=None, large=False, **kw):
        from . import vit as V

        src = "L16" if large else "B16"
        print("Initializing ViT %s model for anime face encoding" % src)
        del device
        super().__init__(V.vit_l16() if large else V.vit_b16(),
                         "vit_anime_" + src.lower(), 128, V.preprocess_uint8, **kw)
        self.norm_scale, self.norm_mean = 1 / 127.5, 127.5  # vit.py:141 affine


class FrcnnDetector(_BoxDetectorBase):
    """Anime face detector; reference API parity with AnimeFRCNN
    (rcnn.py:154-177): __call__(list of BGR frames) -> (boxes, scores, classes)."""

    _name = "FasterRCNN"

    def __init__(self, device=None, checkpoint="frcnn_anime", batch_size=None,
                 params=None, mesh=None, resize_spec=(800, 1333), proposal_cap=1000,
                 out_top=100, host_resize=False, bf16=False, roi_method=None):
        from . import rcnn as R

        print("Initializing FasterRCNN model for anime face detection")
        del device
        self.mesh = mesh
        self.R = R
        self.resize_spec = resize_spec
        self.host_resize = host_resize
        self.compute_dtype = jnp.bfloat16 if bf16 else None
        self.proposal_cap = proposal_cap
        self.out_top = out_top
        self.batch_size = batch_size
        # RoIAlign formulation. The Pallas patch engine
        # (ops/pallas_roialign.py, roi_method="pallas") was MEASURED AND NOT
        # ADOPTED as the throughput default: its per-slot floor (~1.5 us
        # even for skipped slots — SMEM scalar reads + program overhead;
        # tools/profile_roi_pallas.py full-step A/B 28.2 vs 23.0 ms/batch-2
        # on the random-weight proposal mix) makes it a wash at best vs the
        # dense separable matmuls. It stays a tested opt-in for
        # small-proposal-dominated real workloads.
        self.roi_method = "dense" if roi_method is None else roi_method
        if params is None:
            body_vars = jax.jit(R.FasterRCNN(1).init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
            head_vars = jax.jit(R.RoIHead(1).init)(
                jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 256)))
            params = _resolve_checkpoint(checkpoint, {
                "body": body_vars["params"], "head": head_vars["params"]})
        if bf16:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        self.params = params
        self._cache = {}

    def _compiled(self, b, h, w):
        key = (b, h, w)
        if key not in self._cache:
            R = self.R
            nh, nw = R.resized_shape(h, w, *self.resize_spec)
            canvas = R.canvas_shape(nh, nw)
            priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
            fn = _jit_fwd(lambda p, f: R.full_forward(
                p, f, (nh, nw), canvas, [jnp.asarray(x) for x in priors],
                proposal_cap=self.proposal_cap, out_top=self.out_top,
                orig_hw=(h, w) if self.host_resize else None,
                compute_dtype=self.compute_dtype,
                roi_method=self.roi_method), self.mesh)
            self._cache[key] = fn
        return self._cache[key]

    def _resized_hw(self, h, w):
        return self.R.resized_shape(h, w, *self.resize_spec)


class MtcnnDetector:
    """Live-action face detector; reference API parity with RealMTCNN
    (mtcnn.py:312-326): __call__(list of BGR frames) -> list of [n, 5] numpy
    arrays (x1, y1, x2, y2, score), optionally with landmarks."""

    def __init__(self, device=None, min_face_size=5, checkpoint="mtcnn_joined",
                 batch_size=None, caps=None, params=None, mesh=None, bf16=False,
                 crop_engine=None):
        from . import mtcnn as M

        print("Initializing MTCNN model for live-action face detection")
        del device
        self.mesh = mesh
        self.compute_dtype = jnp.bfloat16 if bf16 else None
        self.M = M
        self.minsize = min_face_size
        self.caps = caps or M.Caps()
        self.crop_engine = crop_engine  # None = auto (pallas on TPU)
        self.batch_size = batch_size
        if params is None:
            params = _resolve_checkpoint(checkpoint, {
                "pnet": jax.jit(M.PNet().init)(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
                "rnet": jax.jit(M.RNet().init)(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
                "onet": jax.jit(M.ONet().init)(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
            })
        if bf16:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        self.params = params
        self._cache = {}

    prefetch = staticmethod(prefetch_handle)

    def _compiled(self, b, h, w):
        key = (b, h, w)
        if key not in self._cache:
            M, caps, minsize = self.M, self.caps, self.minsize
            self._cache[key] = _jit_fwd(
                lambda p, f: M.full_forward(p, f, minsize=minsize, caps=caps,
                                            compute_dtype=self.compute_dtype,
                                            crop_engine=self.crop_engine), self.mesh)
        return self._cache[key]

    def submit(self, frames):
        bs = _round_batch(self.batch_size or len(frames), self.mesh)
        arr, n = pad_batch(list(frames), bs)
        fn = self._compiled(*arr.shape[:3])
        return fn(self.params, jnp.asarray(arr)), n

    def collect(self, handle, return_landmarks=False):
        out, n = handle
        boxes, scores, lmk, valid, counts = jax.device_get(out)
        # every stage's surviving-candidate count is surfaced by the graph;
        # warn whenever survivors exceed the NEXT fixed-capacity buffer (that
        # is where truncation happens — a busy frame at min_face_size=5 can
        # overflow stage2/3 without ever tripping stage1). pre1 caps each
        # SCALE independently, so stage 1 is judged by its per-scale peak,
        # not the across-scales total (which trips spuriously on pyramids
        # with many mildly-busy levels)
        for stage, cap_name in [("stage1_scale_max", "pre1"),
                                ("cross_in", "cross"),
                                ("stage2", "stage3"),
                                ("stage3", "out")]:
            cap = getattr(self.caps, cap_name)
            seen = int(np.asarray(counts[stage]).max())
            if seen > cap:
                print("WARNING: MTCNN %s survivors exceeded buffer capacity "
                      "(%d > %d); results may drop low-scoring faces. "
                      "Increase Caps.%s."
                      % (stage.replace("_scale_max", " (per-scale)")
                         .replace("cross_in", "cross-scale input"),
                         seen, cap, cap_name))
        for stage in ("stage2", "stage3"):
            ndrop = int(np.asarray(counts.get(stage + "_crop_dropped", 0)).max())
            if ndrop > 0:
                print("WARNING: MTCNN %s crop buckets dropped %d oversized "
                      "candidate(s) (crops_mid/crops_big capacity); raise "
                      "Caps.crops_mid/crops_big or use crop_engine='gather'."
                      % (stage, ndrop))
        of = int(np.asarray(counts.get("stage1_select_overflow", 0)).max())
        if of > 0:
            print("WARNING: MTCNN stage-1 block-select may have truncated %d "
                  "candidate block(s) (spatially dense detections); rerun in "
                  "parity precision or raise per_block for exact selection." % of)
        res, ldm = [], []
        for i in range(n):
            v = valid[i]
            res.append(np.concatenate([boxes[i][v], scores[i][v][:, None]], axis=1))
            ldm.append(lmk[i][v])
        if return_landmarks:
            return res, ldm
        return res

    def __call__(self, frames, return_landmarks=False):
        return self.collect(self.submit(frames), return_landmarks)
