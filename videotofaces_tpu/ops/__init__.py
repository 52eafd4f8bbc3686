"""Device-side numeric ops (JAX/XLA/Pallas) shared by the detector and encoder models.

Everything in this package is pure, shape-static, and jit-friendly: dynamic-size
results from the reference pipeline (filtering, NMS, proposal selection) are
represented as fixed-capacity padded buffers plus validity masks.
"""

from .boxes import (  # noqa: F401
    decode_boxes,
    convert_to_cwh,
    clamp_to_canvas,
    scale_boxes,
    box_iou_matrix,
    small_boxes_mask,
)
from .anchors import make_anchors, get_priors  # noqa: F401
from .nms import nms_keep_mask, batched_nms_topk, iom_chain_suppress  # noqa: F401
