"""videotofaces_tpu — TPU-native (JAX/XLA/Pallas) video-to-faces framework.

Takes video file(s), outputs cropped face images grouped by person/character.
Pipeline: host video decode -> batched on-device face detection (MTCNN /
YOLOv3 / Faster R-CNN) -> box filter/expand/square -> crop & save ->
hash dedup -> batched on-device face embedding (FaceNet / ViT) -> embedding
dedup -> on-device K-means clustering (silhouette model selection) or
reference-image classification -> grouped output folders.

API parity target: `videotofaces` (reference __init__.py:1-2).
"""

from .api import video_to_faces  # noqa: F401
from .utils.gallery import image_gallery, dataframe_with_images  # noqa: F401

__version__ = "0.1.0"
