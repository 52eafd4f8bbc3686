"""Walkthrough: the three fine-tuning paths on synthetic data.

1. YOLO head-only re-fit (frozen Darknet trunk) on frames + gt boxes;
2. YOLO full fine-tune with layerwise learning rates;
3. FaceNet-style triplet metric learning with the cross-batch memory bank.

All run on synthetic data with seeded random init so the script works
anywhere (CPU included); pass converted checkpoints via weights/ for real
adaptation. Multi-chip: every path takes mesh= (see parallel.make_mesh).

    python examples/finetune_demo.py
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from videotofaces_tpu.models import yolo as Y  # noqa: E402
from videotofaces_tpu.train import (finetune_facenet, finetune_yolo_full,  # noqa: E402
                                    finetune_yolo_head)


def synthetic_detection_data(rng, n, size=96):
    frames, gts = [], []
    for _ in range(n):
        f = (rng.random((size, size, 3)) * 60).astype(np.uint8)
        x, y = int(rng.integers(4, size - 40)), int(rng.integers(4, size - 40))
        s = int(rng.integers(20, 36))
        f[y:y + s, x:x + s] = (210, 180, 160)
        frames.append(f)
        gts.append(np.asarray([[x, y, x + s, y + s]], np.float32))
    return np.stack(frames), gts


def main():
    rng = np.random.default_rng(0)
    frames, gts = synthetic_detection_data(rng, 16)
    init = jax.jit(Y.YOLOv3(1).init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 96, 96, 3)))["params"]

    print("1) YOLO head-only fine-tune (trunk frozen)...")
    _, hist = finetune_yolo_head(frames, gts, epochs=4, batch_size=8,
                                 learning_rate=3e-3, max_side=96,
                                 params=init, seed=0)
    print("   loss per epoch:", ["%.3f" % h for h in hist])

    print("2) YOLO full fine-tune (layerwise lr backbone 0.1x / neck 0.3x / head 1x)...")
    _, hist = finetune_yolo_full(frames, gts, epochs=4, batch_size=8,
                                 learning_rate=1e-3, max_side=96,
                                 params=init, seed=0)
    print("   loss per epoch:", ["%.3f" % h for h in hist])

    print("3) Triplet metric learning with a 64-entry memory bank...")
    # 4 identities x 8 crops; class = dominant color + noise
    imgs, labels = [], []
    for k in range(4):
        base = np.full((160, 160, 3), 120.0, np.float32)
        base[..., k % 3] += 12.0                       # faint class signal
        base[: 80 * (k // 2)] += 8.0
        for _ in range(8):
            imgs.append(np.clip(base + rng.normal(0, 60, base.shape),
                                0, 255).astype(np.uint8))
            labels.append(k)
    from flax import linen as nn

    class TinyEnc(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(16, (5, 5), strides=4)(x)).mean(axis=(1, 2))
            return nn.Dense(16)(x)

    model = TinyEnc()
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 160, 160, 3)))["params"]
    _, hist = finetune_facenet(np.stack(imgs), np.asarray(labels), epochs=6,
                               batch_size=16, learning_rate=3e-3,
                               model=model, params=params, bank_size=64)
    print("   loss per epoch:", ["%.3f" % h for h in hist])


if __name__ == "__main__":
    main()
