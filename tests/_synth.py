"""Shared synthetic-data builders for subprocess-level end-to-end tests."""

from __future__ import annotations

import os

import numpy as np


def make_kinetics_tree(root: str, classes=("a", "b"), vids=2, hw=64,
                       frames=60) -> str:
    """<root>/val_256/<class>/*.mp4 with consistent horizontal motion."""
    import cv2

    d = os.path.join(root, "val_256")
    for cls in classes:
        os.makedirs(os.path.join(d, cls), exist_ok=True)
        for vi in range(vids):
            w = cv2.VideoWriter(os.path.join(d, cls, f"v{vi}.mp4"),
                                cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                                (hw, hw))
            rng = np.random.RandomState(vi)
            base = rng.randint(0, 255, (hw, hw, 3), np.uint8)
            for t in range(frames):
                w.write(np.roll(base, t * 3, axis=1))
            w.release()
    return root


def make_davis_tree(root: str, vids=("video0", "video1"), hw=64,
                    frames=10) -> str:
    """DAVIS-2017 layout: JPEGImages/Annotations 480p + ImageSets/2017."""
    import cv2
    from PIL import Image

    from videowalk_tpu.eval.palette import voc_colormap

    pal = voc_colormap().reshape(-1).tolist()
    for vi, vid in enumerate(vids):
        jdir = os.path.join(root, "JPEGImages", "480p", vid)
        adir = os.path.join(root, "Annotations", "480p", vid)
        os.makedirs(jdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        rng = np.random.RandomState(vi)
        bg = rng.randint(0, 80, (hw, hw, 3), np.uint8)
        for t in range(frames):
            img = bg.copy()
            x = hw // 8 + (hw // 16) * t
            img[hw // 3:hw // 3 + hw // 4, x:x + hw // 4] = [200, 40, 40]
            cv2.imwrite(os.path.join(jdir, f"{t:05d}.jpg"), img[:, :, ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            ann = np.zeros((hw, hw), np.uint8)
            ann[hw // 3:hw // 3 + hw // 4, x:x + hw // 4] = 1
            im = Image.fromarray(ann, mode="P")
            im.putpalette(pal)
            im.save(os.path.join(adir, f"{t:05d}.png"))
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(vids) + "\n")
    return root


def make_crw_checkpoint(path: str, model_type="scratch", seed=0) -> str:
    """A .pth CRW checkpoint with randomly-initialized weights."""
    import jax
    import jax.numpy as jnp

    from videowalk_tpu.models import CRW, CRWConfig
    from videowalk_tpu.utils import save_checkpoint

    model = CRW(CRWConfig(model_type=model_type, head_depth=0))
    x = jnp.zeros((1, 2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    save_checkpoint(path, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                    lr_scheduler_state={"step": 0}, epoch=0, args={})
    return path
