"""Turnkey weights provisioning: download every published torch checkpoint
and convert it to the named .npz format the wrappers load.

Run on a machine WITH network access:

    python tools/fetch_and_convert.py            # all 7 checkpoints
    python tools/fetch_and_convert.py yolo rcnn  # a subset

then run the pretrained parity suite:

    python -m pytest tests/test_golden_pretrained.py -v

Checkpoint sources are the reference's own URL table
(videotofaces_tpu/utils/download.TORCH_CHECKPOINT_URLS; reference
README.md:91-136). This environment has zero egress, so here the script only
prints what it would do; nothing in the test suite depends on it.
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from convert_weights import convert  # noqa: E402
from videotofaces_tpu.utils.download import (TORCH_CHECKPOINT_URLS,  # noqa: E402
                                             fetch_torch_checkpoint)
from videotofaces_tpu.utils import weights as W  # noqa: E402

# checkpoint name -> converter model key
CONVERTER_KEY = {
    "mtcnn_joined": "mtcnn",
    "yolov3_wider": "yolo",
    "frcnn_anime": "rcnn",
    "facenet_vgg": "facenet_vgg",
    "facenet_casia": "facenet_casia",
    "vit_anime_b16": "vit_b",
    "vit_anime_l16": "vit_l",
}


def main(names):
    names = names or list(TORCH_CHECKPOINT_URLS)
    cache = osp.join(W.weights_dir(), "torch")
    os.makedirs(cache, exist_ok=True)
    failed = []
    for name in names:
        out = osp.join(W.weights_dir(), name + ".npz")
        if osp.isfile(out):
            print("already converted: " + out)
            continue
        try:
            pt = fetch_torch_checkpoint(name, cache)
            convert(CONVERTER_KEY[name], pt, out)
        except Exception as e:
            failed.append(name)
            print("FAILED %s: %r" % (name, e))
    if failed:
        raise SystemExit("failed: " + ", ".join(failed))
    print("\nAll checkpoints converted. Verify parity with:\n"
          "  python -m pytest tests/test_golden_pretrained.py -v")


if __name__ == "__main__":
    main(sys.argv[1:])
