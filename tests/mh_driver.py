"""Subprocess driver for multi-host tests: runs one "host" of a (possibly)
multi-host video_to_faces job on CPU with small random-init models and a
deterministic fake encoder. Topology comes from V2F_PROCESS_INDEX/COUNT +
V2F_GATHER_DIR (parallel/multihost.py file-exchange transport).

Usage: python mh_driver.py <input_dir> <out_dir> <mode>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from videotofaces_tpu import api  # noqa: E402


class FakeEncoder:
    """Deterministic embedding = per-channel means + quadrant means of a
    fixed-resize gray image: stable across hosts, varied enough to cluster."""

    input_size = 32
    batch_size = None

    def __call__(self, images):
        import cv2

        out = []
        for img in images:
            a = cv2.resize(img, (16, 16)).astype(np.float32)
            g = a.mean(axis=2)
            out.append(np.concatenate([
                a.mean(axis=(0, 1)),
                [g[:8, :8].mean(), g[:8, 8:].mean(), g[8:, :8].mean(), g[8:, 8:].mean()],
            ]))
        return np.asarray(out, np.float32)


def main():
    input_dir, out_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]

    from videotofaces_tpu.models import yolo as Y
    from videotofaces_tpu.models.wrappers import YoloDetector

    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)))["params"]

    api.get_detector_model = lambda style, det, dev: YoloDetector(
        params=params, max_side=96, batch_size=4)
    api.get_encoder_model = lambda style, enc, dev: FakeEncoder()
    # grouping.test_grouping & encode_refs use the module-level factory too
    import videotofaces_tpu.pipeline.grouping as G

    G.get_encoder_model = api.get_encoder_model

    api.video_to_faces(
        input_path=input_dir, out_dir=out_dir, style="live", mode=mode,
        det_model="yolo", video_step=1, hash_thr=8, det_min_score=0.0,
        det_min_size=1, det_min_border=0, det_scale=(1.0, 1.0, 1.0, 1.0),
        det_square=False, clusters="3", group_mode="clustering",
        enc_dup_thr=-1, group_log=True)


if __name__ == "__main__":
    main()
