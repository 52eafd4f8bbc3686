"""Generate golden regression fixtures: seeded-random-param model outputs on
the reference's checked-in test images.

The reference's tests are golden-value regressions against pretrained weights
(tests/test_*.py there); with no network access, we pin the same contract to
seeded params instead — any refactor that changes numerics shows up as a
golden diff. Correctness itself is established separately by the oracle tests.

    python tools/gen_golden.py          # writes tests/golden/*.npz
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

REF_IMAGES = "/root/reference/tests/images"
OUT_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tests", "golden")


def load(names):
    imgs = [cv2.imread(osp.join(REF_IMAGES, n)) for n in names]
    assert all(i is not None for i in imgs), names
    return imgs


def seeded_params(model, rng_key, example):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    return jax.jit(model.init)(jax.random.PRNGKey(rng_key), jnp.asarray(example))["params"]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    os.makedirs(OUT_DIR, exist_ok=True)
    out = {}

    # encoders on the reference's enc test images
    from videotofaces_tpu.models.wrappers import FaceNetEncoder, VitEncoder
    from videotofaces_tpu.models import facenet as FN, vit as V

    fn_model = FN.InceptionResnetV1()
    fn_params = seeded_params(fn_model, 10, np.zeros((1, 160, 160, 3), np.float32))
    enc = FaceNetEncoder(params=fn_params)
    emb = enc(load(["irl_enc_1.jpg", "irl_enc_2.jpg", "irl_enc_3.jpg", "irl_enc_4.jpg"]))
    out["facenet_emb"] = emb

    vit_model = V.vit_b16()
    vit_params = seeded_params(vit_model, 11, np.zeros((1, 128, 128, 3), np.float32))
    venc = VitEncoder(params=vit_params)
    out["vit_emb"] = venc(load(["anime_enc_1.jpg", "anime_enc_2.jpg"]))

    # YOLO on live det images (downscaled for CPU speed)
    from videotofaces_tpu.models.wrappers import YoloDetector
    from videotofaces_tpu.models import yolo as Y

    y_params = seeded_params(Y.YOLOv3(1), 12, np.zeros((1, 96, 160, 3), np.float32))
    det = YoloDetector(params=y_params, max_side=320)
    imgs = load(["irl_det_1.jpg", "irl_det_2.jpg"])
    b, s, c = det(imgs)
    for i in range(2):
        out[f"yolo_boxes_{i}"] = b[i][:20]
        out[f"yolo_scores_{i}"] = s[i][:20]

    # MTCNN on one live det image
    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.models.wrappers import MtcnnDetector

    m_params = {
        "pnet": seeded_params(M.PNet(), 13, np.zeros((1, 12, 12, 3), np.float32)),
        "rnet": seeded_params(M.RNet(), 14, np.zeros((1, 24, 24, 3), np.float32)),
        "onet": seeded_params(M.ONet(), 15, np.zeros((1, 48, 48, 3), np.float32)),
    }
    caps = M.Caps(pre1=512, post1=128, cross=512, stage2=256, stage3=128, out=64)
    mdet = MtcnnDetector(params=m_params, min_face_size=40, caps=caps)
    small = [cv2.resize(imgs[0], (256, 170))]
    res = mdet(small)
    out["mtcnn_res_0"] = res[0]

    # Faster R-CNN on one anime det image (small resize spec for CPU speed)
    from videotofaces_tpu.models import rcnn as R
    from videotofaces_tpu.models.wrappers import FrcnnDetector

    r_params = {
        "body": seeded_params(R.FasterRCNN(1), 16, np.zeros((1, 96, 160, 3), np.float32)),
        "head": seeded_params(R.RoIHead(1), 17, np.zeros((1, 7, 7, 256), np.float32)),
    }
    rdet = FrcnnDetector(params=r_params, resize_spec=(128, 224), proposal_cap=128,
                         out_top=32)
    anime = load(["anime_det_1.jpg"])
    rb, rs, rc = rdet(anime)
    out["rcnn_boxes_0"] = rb[0]
    out["rcnn_scores_0"] = rs[0]

    path = osp.join(OUT_DIR, "model_outputs.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in out.items()})
    print("wrote", path, "with", sorted(out))


if __name__ == "__main__":
    main()
