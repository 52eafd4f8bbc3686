"""Detection driver: videos -> cropped face images on disk.

Behavioral contract (reference detection.py:32-162): per file, sample frames
on the step schedule, batch them through the detector, filter/adjust/square
the boxes, crop, name as ``[prefix][kk_]%06d_%u.jpg``, optionally resize,
drop near-duplicates against the previous 5 kept faces, write to
``out_dir/faces``; after all files, run the all-pairs hash dedup.

TPU redesign vs the reference's serialized loop: decode is prefetched on a
background thread, the detector forward is a single jitted device graph
(data-parallel over every local chip when more than one is visible), and face
writes go through an async writer pool — decode / device compute / disk IO
overlap instead of alternating. Stage wall-times are accumulated in a
StageTimer and reported after each run; set V2F_PROFILE_DIR to additionally
capture a jax.profiler device trace.
"""

import os
import os.path as osp
from collections import deque

import numpy as np

from ..hostio import (AsyncImageWriter, ParallelFrameSource,
                      PrefetchingFrameSource, decode_workers_default,
                      open_reader)
from ..hostio.video import frame_schedule
from ..utils.image import resize_keep_ratio
from ..utils.pbar import tqdm
from ..utils.profiling import StageTimer, trace
from ..parallel import multihost as MH
from . import boxfilter as BF
from .dupes import remove_dupes_nearest, remove_dupes_overall
from .mesh_auto import default_mesh


def get_detector_model(style, det_model, device=None, mesh="auto", **model_kw):
    """String-dispatch model factory (reference detection.py:22-29; extended
    so any detector can pair with any style — see prep.validate_args).

    ``mesh="auto"`` shards inference over all local devices when more than one
    is present (the TPU-native analogue of the reference's single global
    device pick, main.py:38-39); pass ``mesh=None`` or set V2F_SINGLE_DEVICE=1
    to force one chip."""
    if mesh == "auto":
        mesh = default_mesh()
    if det_model == "rcnn" or (det_model == "default" and style == "anime"):
        from ..models.wrappers import FrcnnDetector

        return FrcnnDetector(device, mesh=mesh, **model_kw)
    if det_model == "mtcnn":
        from ..models.wrappers import MtcnnDetector

        return MtcnnDetector(device, mesh=mesh, **model_kw)
    if det_model in ("yolo", "default"):
        from ..models.wrappers import YoloDetector

        return YoloDetector(device, mesh=mesh, **model_kw)
    # the reference returns 0 here (detection.py:29) but its only caller
    # validates first; direct library callers deserve a source-located error
    raise ValueError("unknown det_model %r (valid: default, yolo, rcnn, mtcnn)"
                     % (det_model,))


def detect_faces(files, model, sampling, criteria, layout, hash_thr,
                 collect_crops=False):
    """Run detection over every video in ``files``. Returns the saved face
    image paths — plus, with ``collect_crops``, a {filename: BGR array} dict
    of the surviving crops so grouping can encode straight from memory
    (zero-disk mode). ``sampling``/``criteria``/``layout`` are
    specs.FrameSampling / specs.BoxCriteria / specs.OutputLayout."""
    dedup_on = bool(hash_thr) and hash_thr != -1
    layout.prepare_dirs(dedup_on)
    if len(files) > 1:
        print("File count: " + str(len(files)))

    timer = StageTimer()
    names, hashes = [], []
    crops = {} if collect_crops else None
    with trace():
        for k, path in enumerate(files):
            print("Processing " + path)
            # multi-file runs get a per-file "01_", "02_", ... name prefix
            file_layout = layout if len(files) == 1 else \
                layout.with_prefix(layout.prefix + "%02d_" % (k + 1))
            n, h = process_video(path, model, sampling, criteria, file_layout,
                                 hash_thr, timer, crops)
            names += n
            hashes += h

        # multi-host jobs dedup GLOBALLY: gather every host's (hash, name)
        # rows, compute identical keep decisions everywhere, apply local
        # deletions only. Hosts with zero faces still join the gather.
        n_hosts = MH.process_info()[1]
        if dedup_on and (names or n_hosts > 1):
            with timer.stage("dedup:all-pairs", items=len(names)):
                # explicit uint64: np.stack on Python ints straddling 2^63
                # would promote to float64 and corrupt the low hash bits
                arr = np.asarray(hashes, dtype=np.uint64)
                if n_hosts > 1:
                    g_arr, g_names = MH.allgather_rows(arr, names)
                    if len(g_names):
                        _, g_keep = remove_dupes_overall(g_arr, g_names, "hash",
                                                         hash_thr, layout)
                        local = set(names)
                        names = [n for n in g_keep if n in local]
                elif names:
                    _, names = remove_dupes_overall(arr, names, "hash",
                                                    hash_thr, layout)

    paths = [layout.face_path(fn) for fn in names]
    print()
    print("Saved a total of %u faces to: %s" % (len(paths), layout.faces_dir))
    print()
    timer.report()
    if collect_crops:
        keep = {osp.basename(fn) for fn in names}
        return paths, {k: v for k, v in crops.items() if k in keep}
    return paths


def process_video(path, model, sampling, criteria, layout, hash_thr, timer=None,
                  crops=None):
    """One video through the detector. Returns (face filenames, their hashes)."""
    reader = open_reader(path, sampling.reader)
    if not reader.is_open():
        print("ERROR: could not open video: %s" % path)
        return [], []
    indices, step = frame_schedule(reader.length, reader.fps, sampling.step,
                                   sampling.fragment)
    workers = decode_workers_default()
    if workers > 1 and len(indices) > criteria.batch_size * workers:
        # multi-core host: segmented parallel decode (order-preserving)
        reader.close()
        source = ParallelFrameSource(path, indices, step, criteria.batch_size,
                                     sampling.area, sampling.reader, workers)
    else:
        source = PrefetchingFrameSource(reader, indices, step, criteria.batch_size,
                                        sampling.area)
    try:
        return process_stream(source, len(indices), model, criteria, layout,
                              hash_thr, timer, crops)
    finally:
        # join the decode thread(s) BEFORE releasing the reader: on an early
        # exit (device error, Ctrl-C) a worker may be mid-cap.read(), and
        # cv2.VideoCapture is not safe against a concurrent release; stop()
        # also unblocks a worker stuck on the bounded prefetch queue
        if source.stop():
            reader.close()


def process_stream(source, n_frames, model, criteria, layout, hash_thr, timer=None,
                   crops=None):
    """The detector loop over any (indices, frames) batch source — the decode
    strategy (prefetch thread, parallel segments, in-memory replay) is the
    caller's choice. Returns (face filenames, their hashes)."""
    timer = timer if timer is not None else StageTimer()
    if getattr(model, "batch_size", False) is None:
        model.batch_size = criteria.batch_size  # one static jit bucket per video

    names, hashes = [], []
    pbar = tqdm(total=n_frames)
    can_pipeline = hasattr(model, "submit")
    prefetch = getattr(model, "prefetch", None)
    # In-flight queue depth: how many submitted batches ride ahead of the
    # collect point. Each submit also starts async D2H copies of its results
    # (wrappers.prefetch_handle), so by the time a batch reaches the head of
    # the queue its bytes have already landed and collect() doesn't stall on
    # the D2H round trip. Depth 8 measured at device-graph rate on the dev
    # tunnel (8.1 ms/batch-8 vs 64.5 at depth 1, tools/profile_pipeline.py);
    # host memory held peaks at depth+1 batches of decoded frames (~50 MB
    # per batch-8 of 1080p; the queue reaches depth+1 just before the pop).
    # Clamped to >= 1: even the most memory-constrained setting keeps one
    # batch in flight so collect never blocks on its own submit.
    depth = max(1, int(os.environ.get("V2F_PIPELINE_DEPTH", "8")))
    inflight = deque()  # (handle, frames, indices) awaiting collect
    with AsyncImageWriter() as writer:

        def finish(inflight):
            handle, b_frames, b_idx = inflight
            with timer.stage("detect:collect", items=len(b_idx)):
                detout = model.collect(handle)
            with timer.stage("host:postprocess"):
                batch_names, new_hashes = process_frames_batch(
                    b_frames, b_idx, detout, criteria, layout, hash_thr,
                    hashes, writer, crops)
            names.extend(batch_names)
            pbar.update(len(b_idx))
            return new_hashes

        it = iter(source)
        while True:
            with timer.stage("decode:wait"):
                nxt = next(it, None)
            if nxt is None:
                break
            bi, frames = nxt
            if not can_pipeline:
                with timer.stage("detect:forward", items=len(bi)):
                    detout = model(frames)
                with timer.stage("host:postprocess"):
                    batch_names, hashes = process_frames_batch(
                        frames, bi, detout, criteria, layout, hash_thr,
                        hashes, writer, crops)
                names.extend(batch_names)
                pbar.update(len(bi))
                continue
            # software pipelining: dispatch batch i (and start async D2H of
            # its results), then post-process batch i-depth on the host while
            # the device runs and older results stream back
            with timer.stage("detect:submit", items=len(bi)):
                handle = model.submit(frames)
                if prefetch is not None:
                    prefetch(handle)
            inflight.append((handle, frames, bi))
            if len(inflight) > depth:
                hashes = finish(inflight.popleft())
        while inflight:
            hashes = finish(inflight.popleft())
    pbar.close()
    return names, [h for (h, _) in hashes]


def process_frames_batch(frames, indices, detout, criteria, layout, hash_thr,
                         hashes, writer, crops=None):
    """Host post-processing for one batch. ``detout`` is the detector output —
    either (boxes, scores[, classes]) lists or a list of [n, 5] arrays."""
    img_size = frames[0].shape[:2]

    if isinstance(detout, tuple):
        boxes_list, scores_list = detout[0], detout[1]
    else:
        boxes_list = [d[:, :4] for d in detout]
        scores_list = [d[:, 4] for d in detout]

    faces = []
    for frame, frame_idx, raw_boxes, raw_scores in zip(frames, indices, boxes_list, scores_list):
        # 2. round to ints and apply the three rejection conditions
        iboxes = BF.round_out(raw_boxes)
        scores = np.asarray(raw_scores)
        c1, c2, c3 = BF.check_conditions(iboxes, scores, img_size, criteria.min_score,
                                         criteria.min_size, criteria.min_border)
        rejected = c1 | c2 | c3
        if layout.save_frames:
            BF.render_debug_frame(
                frame, iboxes, scores, rejected,
                layout.intermediate("frames", layout.prefix + "%06d.jpg" % frame_idx))
        if layout.save_rejects:
            BF.save_rejects_and_log(frame, frame_idx, iboxes, scores, c1, c2, c3,
                                    layout.root, layout.prefix, criteria.min_score,
                                    criteria.min_size, criteria.min_border)
        passed = iboxes[~rejected]
        # 3. scale/square the survivors
        adjusted = BF.adjust_boxes(passed, img_size, criteria.scale, criteria.square)
        # 4-6. crop and name as %06d_%u.jpg (skip crops that fall fully
        # outside the frame — only possible with degenerate detector outputs)
        for j, (x1, y1, x2, y2) in enumerate(adjusted):
            crop = frame[y1:y2, x1:x2]
            if crop.size == 0:
                continue
            faces.append((crop, layout.prefix + "%06d_%u.jpg" % (frame_idx, j)))

    # 7. optional thumbnailing
    if layout.resize_to:
        faces = [(resize_keep_ratio(img, layout.resize_to), fn) for (img, fn) in faces]
    # 8. previous-5 hash dedup
    if hash_thr and hash_thr != -1:
        faces, hashes = remove_dupes_nearest(faces, hashes, hash_thr, layout)
    # 9. async writes (and the optional in-memory copy for zero-disk encode)
    for img, fn in faces:
        if crops is not None:
            crops[fn] = img
        writer.write(layout.face_path(fn), img)
    return [fn for (_, fn) in faces], hashes
