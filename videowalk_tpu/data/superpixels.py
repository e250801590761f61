"""Host superpixel segmentation: SLIC / Felzenszwalb per video frame.

Parity surface with reference ``code/data/superpixels.py``:

- ``compute_sp_slic``  <-> :9-15 (cv2 min-max normalize to uint8 -> SLIC)
- ``compute_sp_FH``    <-> :18-20 (felzenszwalb scale=600 sigma=0.5 min 400)
- ``compute_mask``     <-> :23-63 (per-frame loop, 'random' method choice,
  randomized segment counts, 3-channel replication)

Implementation: the C++ library (videowalk_tpu/native/superpixels.cc) is the
fast host path; a pure-numpy SLIC serves as fallback and as a cross-check
oracle for tests. The *training* pipeline prefers the batched on-device SLIC
(videowalk_tpu/ops/slic_device.py) — this host path exists for API parity,
CPU-only runs, and the FH method (sequential union-find).
"""

from __future__ import annotations

import ctypes

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_lib = None


def _native():
    global _lib
    if _lib is None:
        from videowalk_tpu.native import build_and_load

        lib = build_and_load("superpixels")
        lib.slic_segment.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.felzenszwalb_segment.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib


def _normalize_uint8(img: np.ndarray) -> np.ndarray:
    """cv2.normalize(img, None, 0, 255, NORM_MINMAX, CV_8U) semantics
    (reference code/data/superpixels.py:11)."""
    if cv2 is not None:
        return cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX, cv2.CV_8U)
    lo, hi = float(img.min()), float(img.max())
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    return np.clip((img - lo) * scale, 0, 255).astype(np.uint8)


def _rgb_to_lab_f32(img_uint8: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 CIELAB (D65), like skimage's convert2lab."""
    f = img_uint8.astype(np.float32) / 255.0
    if cv2 is not None:
        return cv2.cvtColor(f, cv2.COLOR_RGB2LAB)
    # numpy fallback mirrors ops/slic_device.rgb_to_lab
    import jax.numpy as jnp  # pragma: no cover

    from videowalk_tpu.ops.slic_device import rgb_to_lab  # pragma: no cover

    return np.asarray(rgb_to_lab(jnp.asarray(f)))  # pragma: no cover


def _slic_numpy(lab: np.ndarray, n_segments: int, compactness: float,
                n_iter: int = 10) -> np.ndarray:
    """Vectorized numpy SLIC (fallback + test oracle for the C++/device paths)."""
    H, W = lab.shape[:2]
    S = np.sqrt(H * W / n_segments)
    ratio = compactness / S

    gh = max(1, int(np.sqrt(n_segments * H / W) + 0.5))
    gw = int(np.ceil(n_segments / gh))
    cy = ((np.arange(n_segments) // gw) % gh + 0.5) * H / gh
    cx = (np.arange(n_segments) % gw + 0.5) * W / gw
    ci = (np.clip(cy.astype(int), 0, H - 1) * W
          + np.clip(cx.astype(int), 0, W - 1))
    flat = lab.reshape(-1, 3)
    c_color = flat[ci].copy()

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    py, px = yy.ravel(), xx.ravel()

    labels = np.zeros(H * W, np.int32)
    for _ in range(n_iter):
        dist = np.full(H * W, np.inf, np.float32)
        for k in range(n_segments):
            y0, y1 = max(0, int(cy[k] - 2 * S)), min(H, int(cy[k] + 2 * S) + 1)
            x0, x1 = max(0, int(cx[k] - 2 * S)), min(W, int(cx[k] + 2 * S) + 1)
            win = (yy[y0:y1, x0:x1], xx[y0:y1, x0:x1])
            idx = (win[0].astype(int) * W + win[1].astype(int)).ravel()
            dc = ((flat[idx] - c_color[k]) ** 2).sum(-1)
            ds = ((win[0].ravel() - cy[k]) ** 2 + (win[1].ravel() - cx[k]) ** 2)
            d = dc + ds * ratio * ratio
            better = d < dist[idx]
            dist[idx[better]] = d[better]
            labels[idx[better]] = k
        for k in range(n_segments):
            sel = labels == k
            if sel.any():
                cy[k], cx[k] = py[sel].mean(), px[sel].mean()
                c_color[k] = flat[sel].mean(0)
    return labels.reshape(H, W)


def compute_sp_slic(img: np.ndarray, num_components: int, compactness: float,
                    enforce_connectivity: bool = True,
                    backend: str = "native") -> np.ndarray:
    """SLIC superpixels for one frame (reference code/data/superpixels.py:9-15).

    Args:
      img: HxWx3 array, any range (min-max normalized to uint8 like the
        reference's cv2.normalize call).
      backend: 'native' (C++), 'numpy', or 'device' (JAX).
    """
    img8 = _normalize_uint8(np.ascontiguousarray(img))
    lab = np.ascontiguousarray(_rgb_to_lab_f32(img8), np.float32)
    H, W = lab.shape[:2]
    if backend == "native":
        try:
            lib = _native()
        except Exception:
            backend = "numpy"
        else:
            out = np.empty((H, W), np.int32)
            lib.slic_segment(
                lab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                H, W, int(num_components), float(compactness), 10,
                int(enforce_connectivity),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return out
    if backend == "numpy":
        return _slic_numpy(lab, int(num_components), float(compactness))
    if backend == "device":
        import jax.numpy as jnp

        from videowalk_tpu.ops.slic_device import slic

        return np.asarray(slic(jnp.asarray(img8[None], jnp.float32) / 255.0,
                               int(num_components), float(compactness)))[0]
    raise ValueError(f"unknown backend {backend!r}")


def compute_sp_FH(img: np.ndarray, scale: float = 600.0, sigma: float = 0.5,
                  min_size: int = 400) -> np.ndarray:
    """Felzenszwalb segmentation (reference code/data/superpixels.py:18-20)."""
    img = np.ascontiguousarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if cv2 is not None and sigma > 0:
        img = cv2.GaussianBlur(img, (0, 0), sigma)
    lib = _native()
    H, W = img.shape[:2]
    out = np.empty((H, W), np.int32)
    lib.felzenszwalb_segment(
        np.ascontiguousarray(img).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        H, W, float(scale), int(min_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def compute_mask(video: np.ndarray, sp_method: str, num_components: int,
                 p: float, randomise_superpixels: bool,
                 randomise_superpixels_range: int, compactness: float,
                 rng: np.random.RandomState | None = None) -> np.ndarray:
    """Per-frame superpixel masks for a clip (reference
    code/data/superpixels.py:23-63).

    Args:
      video: (T, C, H, W) or (T, H, W, C) float array (reference passes
        T,C,H,W tensors and permutes per frame).
    Returns:
      (T, 3, H, W) int mask — dense ids replicated to 3 channels,
      matching the reference's output layout (:59-62).
    """
    rng = rng or np.random
    if video.shape[1] == 3 and video.ndim == 4:
        video = np.moveaxis(video, 1, -1)  # -> (T, H, W, C)

    if sp_method == "random":
        method = str(np.asarray(
            rng.choice(["slic", "fh"], 1, p=[p, 1 - p]))[0])
    else:
        method = sp_method

    frames = []
    for t in range(video.shape[0]):
        img = video[t]
        if method == "slic":
            if randomise_superpixels:
                low = num_components - randomise_superpixels_range // 2
                high = num_components + randomise_superpixels_range // 2
                n = int(rng.randint(low, high))
            else:
                n = num_components
            seg = compute_sp_slic(img, n, compactness)
        elif method == "fh":
            seg = compute_sp_FH(img)
        else:
            raise ValueError(f"unknown sp_method {method!r}")
        frames.append(seg)

    mask = np.stack(frames)                      # (T, H, W)
    return np.repeat(mask[:, None], 3, axis=1)   # (T, 3, H, W)
