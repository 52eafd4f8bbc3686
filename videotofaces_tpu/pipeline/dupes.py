"""Three-part duplicate removal with audit logs.

Behavioral contract (reference dupes.py):

1. ``remove_dupes_nearest`` — during detection, each new face's 8x8 average
   hash is compared to the previous 5 *kept* hashes; hamming distance <= thr
   marks a duplicate (window [-5:], dupes.py:18-48). Host-side: the window is
   tiny and sequential.
2. ``remove_dupes_overall('hash')`` — all-pairs hamming over survivors; a face
   is a duplicate if some EARLIER face is within thr (lower-triangle masking,
   dupes.py:51-93). The N^2 Gram matrix runs on device as matmuls.
3. ``remove_dupes_overall('enc')`` — same with cosine distances over
   embeddings (main.py:72-74).

Duplicates are deleted, or moved to intermediate/dupesN with log_dupesN.csv
when save_dupes is set.
"""

import os
import os.path as osp

import cv2
import numpy as np

from ..ops import distances as D
from ..utils.image import resize_keep_ratio


def ahash(img_bgr):
    """64-bit average hash: gray -> 8x8 -> (> mean), as {0,1} int vector.
    Uses cv2 for bit-exact parity with the reference (dupes.py:11-15)."""
    gray = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2GRAY)
    tiny = cv2.resize(gray, (8, 8))
    return (tiny > tiny.mean()).astype(np.int64).flatten()


def remove_dupes_nearest(faces, hashes, hash_thr, save_params):
    """faces: list[(img, filename)]; hashes: running list[(hash, filename)] of
    kept faces. Returns (kept faces, updated hashes)."""
    out_dir, _, resize_to, _, _, save_dupes = save_params
    kept = []
    log = []
    for img, fn in faces:
        h = ahash(img)
        if not hashes:
            hashes.append((h, fn))
            kept.append((img, fn))
            continue
        window = hashes[-5:]
        diffs = [int(np.count_nonzero(h != p)) for (p, _) in window]
        k = int(np.argmin(diffs))
        md, md_fn = diffs[k], window[k][1]
        log.append("%s,%s,%u,%u" % (fn, md_fn, md, int(md <= hash_thr)))
        if md <= hash_thr:
            if save_dupes:
                dup = img if not resize_to else resize_keep_ratio(img, resize_to)
                cv2.imwrite(osp.join(out_dir, "intermediate", "dupes1", fn), dup)
        else:
            hashes.append((h, fn))
            kept.append((img, fn))

    if save_dupes and log:
        log_fn = osp.join(out_dir, "intermediate", "log_dupes1.csv")
        header = not osp.exists(log_fn)
        with open(log_fn, "a") as f:
            if header:
                f.write("file_name,nearest_in_prev_5,hash_diff,marked_as_duplicate\n")
            f.write("".join(line + "\n" for line in log))
    return kept, hashes


def remove_dupes_overall(x, filenames, dup_params):
    """All-pairs dedup against earlier faces. ``x``: [N, D] hashes ({0,1}) or
    embeddings; returns (x without duplicates, surviving filenames)."""
    measure_type, threshold, save_dupes, out_dir = dup_params
    n = x.shape[0]
    if n == 0:
        return x, filenames

    if measure_type == "hash":
        mins, inds = D.dedup_hash(np.asarray(x))
    else:
        mins, inds = D.dedup_cosine(np.asarray(x, dtype=np.float32))
    mins = np.asarray(mins)
    inds = np.asarray(inds)
    is_dup = mins <= threshold
    is_dup[0] = False  # row 0 has no earlier face (mask adds >= 10000)

    dupes = [fn for i, fn in enumerate(filenames) if is_dup[i]]
    goods = [fn for i, fn in enumerate(filenames) if not is_dup[i]]
    x = np.asarray(x)[~is_dup]

    if not save_dupes:
        for fn in dupes:
            os.remove(osp.join(out_dir, "faces", osp.basename(fn)))
    else:
        digit, colname = ("2", "hash_diff") if measure_type == "hash" else ("3", "distance")
        dup_dir = osp.join(out_dir, "intermediate", "dupes" + digit)
        os.makedirs(dup_dir, exist_ok=True)
        for fn in dupes:
            base = osp.basename(fn)
            os.replace(osp.join(out_dir, "faces", base), osp.join(dup_dir, base))
        with open(osp.join(out_dir, "intermediate", "log_dupes" + digit + ".csv"), "w") as f:
            f.write("file_name,nearest_in_prev," + colname + ",marked_as_duplicate\n")
            for i in range(1, len(filenames)):
                f.write("%s,%s,%s,%s\n" % (filenames[i], filenames[inds[i]],
                                           str(mins[i]), "1" if is_dup[i] else "0"))

    if measure_type != "hash" and is_dup.any():
        print("Removed %u near-duplicates" % int(is_dup.sum()))
    return x, goods
