"""Detection driver: videos -> cropped face images on disk.

Behavioral contract (reference detection.py:32-162): per file, sample frames
on the step schedule, batch them through the detector, filter/adjust/square
the boxes, crop, name as ``[prefix][kk_]%06d_%u.jpg``, optionally resize,
drop near-duplicates against the previous 5 kept faces, write to
``out_dir/faces``; after all files, run the all-pairs hash dedup.

TPU redesign vs the reference's serialized loop: decode is prefetched on a
background thread, the detector forward is a single jitted device graph, and
face writes go through an async writer pool — decode / device compute / disk
IO overlap instead of alternating.
"""

import os
import os.path as osp

import numpy as np

from ..hostio import PrefetchingFrameSource, open_reader, AsyncImageWriter
from ..utils.image import resize_keep_ratio
from ..utils.pbar import tqdm
from . import boxfilter as BF
from .dupes import remove_dupes_nearest, remove_dupes_overall
from ..hostio.video import frame_schedule


def get_detector_model(style, det_model, device=None):
    """String-dispatch model factory (reference detection.py:22-29; extended
    so any detector can pair with any style — see prep.validate_args)."""
    if det_model == "rcnn" or (det_model == "default" and style == "anime"):
        from ..models.wrappers import FrcnnDetector

        return FrcnnDetector(device)
    if det_model == "mtcnn":
        from ..models.wrappers import MtcnnDetector

        return MtcnnDetector(device)
    if det_model in ("yolo", "default"):
        from ..models.wrappers import YoloDetector

        return YoloDetector(device)
    return 0


def detect_faces(files, model, vid_params, det_params, save_params, hash_thr):
    out_dir, out_prefix, _, save_frames, save_rejects, save_dupes = save_params

    os.makedirs(osp.join(out_dir, "faces"), exist_ok=True)
    if save_frames:
        os.makedirs(osp.join(out_dir, "intermediate", "frames"), exist_ok=True)
    if save_rejects:
        os.makedirs(osp.join(out_dir, "intermediate", "rejects"), exist_ok=True)
    if save_dupes and hash_thr and hash_thr != -1:
        os.makedirs(osp.join(out_dir, "intermediate", "dupes1"), exist_ok=True)

    if len(files) > 1:
        print("File count: " + str(len(files)))

    fnames, hashes = [], []
    for k, path in enumerate(files):
        print("Processing " + path)
        prefix_k = out_prefix + ("" if len(files) == 1 else "%02d_" % (k + 1))
        save_params_k = (out_dir, prefix_k, *save_params[2:])
        fnames_k, hashes_k = process_video(path, model, vid_params, det_params,
                                           save_params_k, hash_thr)
        fnames.extend(fnames_k)
        hashes.extend(hashes_k)

    if hash_thr and hash_thr != -1 and fnames:
        dup_params = ("hash", hash_thr, save_dupes, out_dir)
        _, fnames = remove_dupes_overall(np.stack(hashes), fnames, dup_params)

    paths = [osp.join(out_dir, "faces", fn) for fn in fnames]
    print()
    print("Saved a total of %u faces to: %s" % (len(paths), osp.join(out_dir, "faces")))
    print()
    return paths


def process_video(path, model, vid_params, det_params, save_params, hash_thr):
    video_step, video_fragment, video_area, video_reader = vid_params
    batch_size = det_params[0]

    reader = open_reader(path, video_reader)
    if not reader.is_open():
        print("ERROR: could not open video: %s" % path)
        return [], []
    if getattr(model, "batch_size", False) is None:
        model.batch_size = batch_size  # keep the jitted graph at one static batch shape
    indices, step = frame_schedule(reader.length, reader.fps, video_step, video_fragment)
    source = PrefetchingFrameSource(reader, indices, step, batch_size, video_area)

    fnames, hashes = [], []
    pbar = tqdm(total=len(indices))
    can_pipeline = hasattr(model, "submit")
    pending = None  # (handle, frames, indices) — device busy with this batch
    with AsyncImageWriter() as writer:

        def drain(pending):
            handle, p_frames, p_bi = pending
            detout = model.collect(handle)
            fnames_b, new_hashes = process_frames_batch(
                p_frames, p_bi, detout, det_params, save_params, hash_thr,
                hashes, writer)
            fnames.extend(fnames_b)
            pbar.update(len(p_bi))
            return new_hashes

        for bi, frames in source:
            if not can_pipeline:
                detout = model(frames)
                fnames_b, hashes = process_frames_batch(
                    frames, bi, detout, det_params, save_params, hash_thr,
                    hashes, writer)
                fnames.extend(fnames_b)
                pbar.update(len(bi))
                continue
            # dispatch batch i, then post-process batch i-1 while the device runs
            handle = model.submit(frames)
            if pending is not None:
                hashes = drain(pending)
            pending = (handle, frames, bi)
        if pending is not None:
            hashes = drain(pending)
    pbar.close()
    reader.close()
    return fnames, [h for (h, _) in hashes]


def process_frames_batch(frames, indices, detout, det_params, save_params, hash_thr,
                         hashes, writer):
    """Host post-processing for one batch. ``detout`` is the detector output —
    either (boxes, scores[, classes]) lists or a list of [n, 5] arrays."""
    _, min_score, min_size, min_border, scale, square = det_params
    out_dir, out_prefix, resize_to, save_frames, save_rejects, _ = save_params
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
        c1, c2, c3 = BF.check_conditions(iboxes, scores, img_size,
                                         min_score, min_size, min_border)
        rejected = c1 | c2 | c3
        if save_frames:
            BF.render_debug_frame(
                frame, iboxes, scores, rejected,
                osp.join(out_dir, "intermediate", "frames", out_prefix + "%06d.jpg" % frame_idx))
        if save_rejects:
            BF.save_rejects_and_log(frame, frame_idx, iboxes, scores, c1, c2, c3,
                                    out_dir, out_prefix, min_score, min_size, min_border)
        passed = iboxes[~rejected]
        # 3. scale/square the survivors
        adjusted = BF.adjust_boxes(passed, img_size, scale, square)
        # 4-6. crop and name as %06d_%u.jpg (skip crops that fall fully
        # outside the frame — only possible with degenerate detector outputs)
        for j, (x1, y1, x2, y2) in enumerate(adjusted):
            crop = frame[y1:y2, x1:x2]
            if crop.size == 0:
                continue
            faces.append((crop, out_prefix + "%06d_%u.jpg" % (frame_idx, j)))

    # 7. optional thumbnailing
    if resize_to:
        faces = [(resize_keep_ratio(img, resize_to), fn) for (img, fn) in faces]
    # 8. previous-5 hash dedup
    if hash_thr and hash_thr != -1:
        faces, hashes = remove_dupes_nearest(faces, hashes, hash_thr, save_params)
    # 9. async writes
    for img, fn in faces:
        writer.write(osp.join(out_dir, "faces", fn), img)
    return [fn for (_, fn) in faces], hashes
