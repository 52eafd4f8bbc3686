"""Small host-side image helpers (cv2), matching utils/image.py:4-22 semantics."""

import cv2


def resize_keep_ratio(img, to_area, upscale=True):
    """Resize to fit into ``to_area`` (w, h) or square (a, a), keeping aspect ratio.
    With ``upscale=False``, images already fitting are returned unchanged."""
    h, w = img.shape[:2]
    aw, ah = to_area if isinstance(to_area, tuple) else (to_area, to_area)
    scale = min(aw / w, ah / h)
    if scale != 1 and (upscale or scale < 1):
        img = cv2.resize(img, (int(w * scale), int(h * scale)))
    return img


def crop_to_area(img, area):
    """Fractional crop: area = (px1, py1, px2, py2) in [0, 1] of width/height."""
    h, w = img.shape[:2]
    px1, py1, px2, py2 = area
    return img[int(py1 * h): int(py2 * h + 1), int(px1 * w): int(px2 * w + 1), :]
