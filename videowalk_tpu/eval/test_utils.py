"""Prediction post-processing: dumping, pose extraction, visualization.

Parity surface with reference ``code/utils/test_utils.py``:

- ``dump_predictions`` <-> :85-123 (upsample soft labels, argmax to palette
  colors, blend jpg + mask png + heatmap)
- ``process_pose``     <-> :59-82 (top-3 soft-argmax keypoint coordinates)
- ``vis_pose``         <-> :10-48 (skeleton drawing)
- ``infer_downscale``  <-> :212-216 (hardcoded 320 // [40, 40] = 8)
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

try:
    import imageio
except Exception:  # pragma: no cover
    imageio = None


def infer_downscale(map_scale: int = 8) -> np.ndarray:
    """Feature-map downscale factor (reference hardcodes 8,
    test_utils.py:212-216; ours comes from the encoder spec)."""
    return np.array([map_scale, map_scale])


def dump_predictions(pred: np.ndarray, lbl_set: np.ndarray, img: np.ndarray,
                     prefix: str, heatmap: bool = False,
                     img_is_unit_scale: bool | None = None):
    """Save blend jpg + indexed-color mask png for one frame.

    Args:
      pred: (h, w, L) soft labels at feature resolution.
      lbl_set: (L, 3) or (L, 1) label colors.
      img: (H, W, 3) float [0,1] or uint8 original frame.
      prefix: output path prefix -> ``{prefix}_blend.jpg``, ``{prefix}_mask.png``.
      heatmap: also build the object-1 jet heatmap blend (third return value).
        The reference computes it unconditionally but never writes it to disk
        (its return value is discarded at every call site), and at 480p the
        colormap costs ~15 ms/frame — a fifth of the whole dump — so it is
        opt-in here. Files on disk are identical either way.
      img_is_unit_scale: True when a float ``img`` is in [0,1] (scale by
        255), False when it is already 0-255. None keeps the magnitude
        heuristic (max <= 1.5) — ambiguous for near-black 0-255 floats, so
        callers that know the scale (cli/test.py does) should say so.

    Reference: code/utils/test_utils.py:85-123.
    """
    if img.dtype != np.uint8:
        unit = (img.max() <= 1.5 if img_is_unit_scale is None
                else img_is_unit_scale)
        img = np.uint8(np.clip(img * 255 if unit else img, 0, 255))
    sz = img.shape[:-1]
    pred_dist = cv2.resize(pred, sz[::-1])
    if pred_dist.ndim == 2:
        pred_dist = pred_dist[..., None]

    pred_lbl = np.argmax(pred_dist, axis=-1)
    lbl_arr = np.asarray(lbl_set)
    pred_lbl = lbl_arr.astype(np.int32)[pred_lbl]
    if pred_lbl.ndim == 2:
        pred_lbl = pred_lbl[..., None]
    if pred_lbl.shape[-1] == 1:
        pred_lbl = np.repeat(pred_lbl, 3, axis=-1)
    img_with_label = np.float32(img) * 0.5 + np.float32(pred_lbl) * 0.5

    img_with_heatmap = None
    if heatmap:
        # object-1 heatmap (debug/analysis channel, reference :103-107)
        from matplotlib import cm

        ch = min(1, pred_dist.shape[-1] - 1)
        pred_soft = cv2.resize(pred_dist[..., ch],
                               (img.shape[1], img.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
        pred_soft = cm.jet(np.clip(pred_soft, 0, 1))[..., :3] * 255.0
        img_with_heatmap = np.float32(img) * 0.5 + np.float32(pred_soft) * 0.5

    imageio.imwrite(f"{prefix}_blend.jpg", np.uint8(img_with_label))
    if len(prefix) >= 4 and prefix[-4] == ".":  # reference's path HACK (:112)
        # swap ONLY the extension — the reference's replace('jpg','png')
        # also rewrites 'jpg' in directory components, sending masks to a
        # nonexistent tree when the dataset root contains the substring
        maskname = prefix[:-3] + "png" if prefix.endswith(".jpg") \
            else prefix.replace("jpg", "png")
    else:
        maskname = f"{prefix}_mask.png"
    # compress_level 1: PNG stays lossless at any level, and the mask is the
    # eval artifact read back by convert_davis — halves the write cost at
    # 480p (27 -> 13 ms/frame) for ~50% larger files
    imageio.imwrite(maskname, np.uint8(pred_lbl), compress_level=1)
    return img_with_label, pred_lbl, img_with_heatmap


def process_pose(pred: np.ndarray, lbl_set, topk: int = 3):
    """Soft keypoint coordinates by top-k weighted average
    (reference test_utils.py:59-82)."""
    pred = pred[..., 1:]                      # drop background channel
    h, w, J = pred.shape
    flat = pred.reshape(-1, J)                # (h*w, J)
    topk = min(flat.shape[0], topk)
    ids = np.argsort(-flat, axis=0)[:topk]    # (topk, J)
    vals = np.take_along_axis(flat, ids, axis=0)
    denom = vals.sum(0, keepdims=True)
    denom[denom == 0] = 1.0
    vals = vals / denom
    xx, yy = ids % w, ids // w                # NB pred.shape[1] = w
    coords = np.stack([(xx * vals).sum(0), (yy * vals).sum(0)], axis=0)
    coords[:, flat.sum(0) == 0] = -1

    pred_sharp = np.zeros((h, w, 3))
    for t in range(len(lbl_set) - 1):
        x, y = int(coords[0, t]), int(coords[1, t])
        if x >= 0 and y >= 0 and y < h and x < w:
            pred_sharp[y, x, :] = lbl_set[t + 1]
    return coords, pred_sharp


# JHMDB skeleton parent table (reference test_utils.py:12-26)
_POSE_PARENTS = np.zeros(15, int)
for _child, _parent in [(2, 0), (12, 8), (8, 4), (4, 0), (11, 7), (7, 3),
                        (3, 0), (0, 1), (14, 10), (10, 6), (6, 1), (13, 9),
                        (9, 5), (5, 1)]:
    _POSE_PARENTS[_child] = _parent

_POSE_COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
                [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
                [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
                [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255]]


def vis_pose(ori_img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Draw the JHMDB skeleton (reference test_utils.py:10-48)."""
    # copy=True: ascontiguousarray returns the SAME array when the input is
    # already contiguous, and cv2.line would then draw into the caller's
    # frame (which dump_predictions later blends)
    canvas = np.array(ori_img, copy=True)
    x, y = points[0, :], points[1, :]
    for n in range(len(x)):
        pid = int(_POSE_PARENTS[n]) if n < len(_POSE_PARENTS) else 0
        x1, y1 = int(x[pid]), int(y[pid])
        x2, y2 = int(x[n]), int(y[n])
        if x1 >= 0 and y1 >= 0 and x2 >= 0 and y2 >= 0:
            cv2.line(canvas, (x1, y1), (x2, y2), _POSE_COLORS[n], 8)
    return canvas
