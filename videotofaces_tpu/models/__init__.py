"""Model zoo: detectors (MTCNN, YOLOv3, Faster R-CNN) and encoders (FaceNet, ViT).

All models are flax.linen modules in NHWC layout with float32 params,
designed for XLA: static shapes, fixed-capacity postprocessing, no
data-dependent Python control flow inside jit.
"""
