"""Grouping stage: embeddings -> K-means clusters or reference classification.

Behavioral contract (reference grouping.py):
- ``encode_faces``: batched encode of face images read from disk, with the
  optional fractional ``enc_area`` crop (grouping.py:29-40);
- ``classify_faces``: cosine argmin against one reference embedding per class,
  "other" class when min distance >= threshold, files moved via os.replace,
  optional ``faces/log_classification.csv`` (grouping.py:50-89);
- ``cluster_faces``: K-means for each candidate k (random_state-reproducible,
  sklearn-parity), silhouette / Calinski-Harabasz / Davies-Bouldin scores,
  best k by silhouette, copies into ``G<k>/<label>/`` (or ``<label>/``),
  originals deleted, optional ``faces/log_clustering.csv`` (grouping.py:92-137);
- ``test_grouping``: eval harness against ``out_dir/labels.txt`` printing
  accuracy / rand score / silhouette (grouping.py:140-172).

Device work (embeddings, cosine Gram matrices, K-means, scores) runs in JAX;
this module is the host orchestration and file shuffling around it.
"""

import math
import os
import os.path as osp
import shutil

import cv2
import numpy as np

from ..ops import cluster_scores as CS
from ..ops import distances as D
from ..ops.kmeans import kmeans_fit
from ..utils.image import crop_to_area
from ..utils.pbar import tqdm


def get_encoder_model(style, enc_model, device=None):
    """String-dispatch encoder factory (reference grouping.py:19-26; extended
    so any encoder can pair with any style)."""
    if enc_model.startswith("vit") or (enc_model == "default" and style == "anime"):
        from ..models.wrappers import VitEncoder

        large = False if enc_model == "default" else enc_model[-1] == "l"
        return VitEncoder(device, large)
    if enc_model.startswith("facenet") or (enc_model == "default" and style == "live"):
        from ..models.wrappers import FaceNetEncoder

        casia = False if enc_model == "default" else enc_model.split("_")[1] == "casia"
        return FaceNetEncoder(device, casia)
    return 0


def encode_faces(paths, model, batch_size, area):
    print("Extracting features from images for grouping")
    if getattr(model, "batch_size", False) is None:
        model.batch_size = batch_size
    feats = []
    with tqdm(total=len(paths)) as pbar:
        for b in range(math.ceil(len(paths) / batch_size)):
            images = [cv2.imread(p) for p in paths[batch_size * b: batch_size * (b + 1)]]
            if area:
                images = [crop_to_area(img, area) for img in images]
            xk = model(images)
            feats.append(xk)
            pbar.update(xk.shape[0])
    return np.concatenate(feats)


def encode_refs(refs, model):
    rpaths = [ps[0] for (_, ps) in refs]
    return model([cv2.imread(p) for p in rpaths])


def classify(x, r, classes, thr, log, paths, out_dir):
    """Cosine argmin vs reference embeddings; optional 'other' open set."""
    dist = np.asarray(D.cosine_gram(np.asarray(x, np.float32), np.asarray(r, np.float32)))
    inds = dist.argmin(axis=1)
    if thr and thr != -1:
        mins = dist.min(axis=1)
        inds = np.where(mins >= thr, len(classes), inds)
        classes = classes + ["other"]
    if log:
        fnames = [osp.basename(p) for p in paths]
        with open(osp.join(out_dir, "faces", "log_classification.csv"), "w") as f:
            extra = "(other_threshold=%s)" % str(thr) if thr else ""
            f.write("file_name," + ",".join("dist_" + c for c in classes if c != "other")
                    + ",assigned_to_class" + extra + "\n")
            for i in range(x.shape[0]):
                f.write("%s," % fnames[i] + ",".join("%.4f" % v for v in dist[i])
                        + ",%s\n" % classes[inds[i]])
    return inds, classes


def classify_faces(paths, x, model, classif_params):
    refs, thr, log, out_dir = classif_params
    classes = [c for (c, _) in refs]
    print("Found %u classes in ref_dir: %s" % (len(classes), ", ".join(classes)))
    print("Extracting features from reference images")
    r = encode_refs(refs, model)
    print("Classifying images")
    inds, classes = classify(x, r, classes, thr, log, paths, out_dir)

    img_dir = osp.dirname(osp.abspath(paths[0]))
    for c in classes:
        os.makedirs(osp.join(img_dir, c), exist_ok=True)
    for i, p in enumerate(paths):
        os.replace(p, osp.join(img_dir, classes[inds[i]], osp.basename(p)))

    print("Grouped %u images into %u folders:" % (len(paths), len(classes)))
    for i, c in enumerate(classes):
        print(c + ": " + str(int(np.count_nonzero(inds == i))))
    print()


def cluster_faces(paths, x, cluster_params):
    clusters, save_all, rstate, log, out_dir = cluster_params
    clusters = [c for c in clusters if c <= len(paths)]

    print("Clustering images into %s groups" % ", ".join(str(c) for c in clusters))
    labels = [kmeans_fit(x, k, random_state=rstate)[0] for k in clusters]

    scores = []
    for i, k in enumerate(clusters):
        s1 = CS.silhouette_score(x, labels[i], k)
        s2 = CS.calinski_harabasz_score(x, labels[i], k)
        s3 = CS.davies_bouldin_score(x, labels[i], k)
        scores.append((k, s1, s2, s3))
    if log:
        with open(osp.join(out_dir, "faces", "log_clustering.csv"), "w") as f:
            f.write("n_clusters,silhouette_score,calinski_harabasz_score,davies_bouldin_score\n")
            for sc in scores:
                f.write("%u,%s,%s,%s\n" % sc)

    if not save_all:
        best_k = max(scores, key=lambda s: s[1])[0]
        i = clusters.index(best_k)
        clusters, labels = [clusters[i]], [labels[i]]
        print("The number of groups chosen: %u" % best_k)

    print("Grouped %u images into %s folders:"
          % (len(paths), "/".join(str(c) for c in clusters)))
    img_dir = osp.dirname(osp.abspath(paths[0]))
    for i, k in enumerate(clusters):
        sub = "G%u" % k if len(clusters) > 1 else ""
        for j in range(k):
            os.makedirs(osp.join(img_dir, sub, str(j)), exist_ok=True)
        for j, p in enumerate(paths):
            shutil.copyfile(p, osp.join(img_dir, sub, str(labels[i][j]), osp.basename(p)))
        values, counts = np.unique(labels[i], return_counts=True)
        print((sub + ": " if sub else "") + ", ".join("%u: %u" % (v, c)
                                                      for v, c in zip(values, counts)))
    print()
    for p in paths:
        os.remove(p)


def test_grouping(paths, refs, test_params):
    """Embedding-quality eval harness (reference grouping.py:140-155)."""
    style, enc_model, device, out_dir, exclude_other, bs, area, thr, rstate = test_params
    gt, paths, n_clusters = get_ground_truths(paths, out_dir, exclude_other)
    model = get_encoder_model(style, enc_model, device)
    x = encode_faces(paths, model, bs, area)
    r = encode_refs(refs, model)

    inds, _ = classify(x, r, [c for (c, _) in refs],
                       None if exclude_other else thr, True, paths, out_dir)
    acc = np.count_nonzero(inds + 1 == gt) / gt.size

    labels, _, _ = kmeans_fit(x, n_clusters, random_state=rstate)
    rand_scr = CS.rand_score(gt, labels)
    silh_scr = CS.silhouette_score(x, labels, n_clusters)

    print("%.4f / %.4f / %.4f" % (acc, rand_scr, silh_scr))
    print("classification accuracy / rand score for clustering / silhouette score for clustering")


def get_ground_truths(paths, out_dir, exclude_other):
    try:
        with open(osp.join(out_dir, "labels.txt")) as f:
            gt = np.asarray([int(v) for v in f.read().splitlines()])
    except Exception:
        raise ValueError("Could not load ground truth labels for testing."
                         "Expecting file \"labels.txt\" inside out_dir, "
                         "filled with line-separated integers")
    if exclude_other:
        other = gt.max()
        count = int(np.count_nonzero(gt == other))
        paths = [p for i, p in enumerate(paths) if gt[i] != other]
        gt = gt[gt != other]
        print('Excluded %u images with "other" class' % count)
    return gt, paths, int(gt.max())
