"""Offline torch-checkpoint -> named npz converter.

Replaces the reference's at-import positional state-dict remap
(utils/weights.py:9-48) with a one-time, explicit, shape-checked conversion.
Run once per pretrained .pt file (requires torch; the runtime never does):

    python tools/convert_weights.py yolo   path/to/yolov3_wider.pt
    python tools/convert_weights.py rcnn   path/to/mmdet_anime-face_faster-rcnn.pth
    python tools/convert_weights.py mtcnn  path/to/mtcnn_joined.pt
    python tools/convert_weights.py facenet_vgg   path/to/20180402-114759-vggface2.pt
    python tools/convert_weights.py facenet_casia path/to/20180408-102900-casia-webface.pt
    python tools/convert_weights.py vit_b  path/to/vit_anime_b16.pt
    python tools/convert_weights.py vit_l  path/to/vit_anime_l16.pt

Outputs <repo>/weights/<name>.npz, which the model wrappers load at init.
Source tensors are consumed IN ORDER against each model's spec (the same
ordering contract the reference relies on), with layout transforms
(OIHW->HWIO, linear transposes, NCHW->NHWC flatten reshuffles) applied and
every shape validated against the flax param tree.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np  # noqa: E402


def load_torch_tensors(path, sub=None, reorder=None, drop_suffixes=()):
    import torch

    wd = torch.load(path, map_location="cpu", weights_only=False)
    if sub:
        wd = wd[sub]
    if hasattr(wd, "state_dict"):
        wd = wd.state_dict()
    items = [(k, v) for k, v in wd.items()
             if not any(k.endswith(s) for s in drop_suffixes)]
    if reorder:
        items = reorder(items)
    return [np.asarray(v.float().numpy() if hasattr(v, "float") else v)
            for _, v in items]


def mmdet_roi_reorder(items):
    """mmdet puts the RoI cls/reg FCs before the shared FCs; the reference's
    wconv (rcnn.py:159-166) moves the last 8 entries: [cls/reg, fc] -> [fc, cls/reg]."""
    head, tail = items[:-8], items[-8:]
    return head + tail[4:] + tail[:4]


def anime_vit_reorder(items, depth):
    """AnimeVIT.wconv (vit.py:112-127): drop text/decoder/mlm/fc heads, move
    positional_embedding before the class-token tail, and move each block's
    norms before its attention/mlp weights."""
    out = []
    for name, v in items:
        if any(s in name for s in ("text_embeddings", "decoder", "mlm_head",
                                   "model.fc", "class_head.1")):
            continue
        if "positional_embedding" in name:
            out.insert(len(out) - 2, (name, v))
        elif "norm1" in name:
            out.insert(len(out) - 8, (name, v))
        elif "norm2" in name:
            out.insert(len(out) - 4, (name, v))
        else:
            out.append((name, v))
    return out


def facenet_drop_logits(items):
    return [(k, v) for k, v in items if not k.startswith("logits.")]


def convert(model_name, pt_path, out_path=None):
    from videotofaces_tpu.utils import weights as W

    if model_name == "yolo":
        from videotofaces_tpu.models.yolo import torch_spec

        spec = torch_spec()
        tensors = load_torch_tensors(pt_path)
        flat = W.convert_state(spec, tensors)
        default = "yolov3_wider"
    elif model_name == "rcnn":
        from videotofaces_tpu.models.rcnn import torch_spec

        body_spec, head_spec = torch_spec()
        tensors = load_torch_tensors(pt_path, sub="state_dict", reorder=mmdet_roi_reorder)
        flat_all = W.convert_state(body_spec + head_spec, tensors)
        flat = {}
        head_paths = {el[1] for el in head_spec}
        for k, v in flat_all.items():
            top = k.split("/")[0]
            flat[("head/" if top in head_paths else "body/") + k] = v
        default = "frcnn_anime"
    elif model_name == "mtcnn":
        from videotofaces_tpu.models.mtcnn import torch_spec

        spec = torch_spec()
        tensors = load_torch_tensors(pt_path)
        flat = W.convert_state(spec, tensors)
        default = "mtcnn_joined"
    elif model_name.startswith("facenet"):
        from videotofaces_tpu.models.facenet import torch_spec

        spec = torch_spec()
        tensors = load_torch_tensors(pt_path, reorder=facenet_drop_logits,
                                     drop_suffixes=("num_batches_tracked",))
        flat = W.convert_state(spec, tensors)
        default = model_name
    elif model_name in ("vit_b", "vit_l"):
        from videotofaces_tpu.models.vit import torch_spec

        depth = 12 if model_name == "vit_b" else 24
        spec = torch_spec(depth)
        tensors = load_torch_tensors(
            pt_path, reorder=lambda it: anime_vit_reorder(it, depth))
        flat = W.convert_state(spec, tensors)
        default = "vit_anime_" + ("b16" if model_name == "vit_b" else "l16")
    else:
        raise SystemExit(f"unknown model {model_name!r}")

    out_path = out_path or osp.join(W.weights_dir(), default + ".npz")
    W.save_npz(out_path, flat)
    print(f"wrote {len(flat)} tensors to {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="yolo | rcnn | mtcnn | facenet_vgg | facenet_casia | vit_b | vit_l")
    ap.add_argument("pt_path")
    ap.add_argument("-o", "--out")
    args = ap.parse_args()
    convert(args.model, args.pt_path, args.out)
