"""Real-photograph evaluation corpus from images bundled in the sandbox.

Every quality number before round 4 was measured on procedurally generated
images (train/data.py held-out seeds, train/ood.py disjoint generators); the
reference's product premise is restoring *real photographs*
(image-restoration-platform.md:1140). Zero egress rules out downloading a
corpus — but several packages baked into this image ship real camera
photographs and photographic surface textures as sample/asset data. This
module indexes them (read-only, located at import of the host environment;
nothing is copied into the repo) and cuts them into evaluation patches.

Corpus (verified real photographs, not renders):
* sklearn ``china.jpg`` / ``flower.jpg`` — 640x427 camera photos (the
  scikit-learn sample images).
* matplotlib ``grace_hopper.jpg`` — 512x600 portrait photograph.
* pygame ``camera_rgb.jpg`` — 320x240 webcam frame (indoor scene, person).
* gymnasium-robotics kitchen textures (``wood1``, ``marble1``, ``tile1``,
  ``white_marble_tile*``) — photographed material surfaces.
* dm_control ``OutdoorGrassFloorD`` / ``OutdoorSkybox2048`` — grass and sky
  photographs.

The patches go through the SAME degradation operators as the OOD suite
(train/ood.py: shot noise, defocus/motion PSFs, real libjpeg, vignette), so
real-photo numbers are directly comparable with the procedural OOD numbers.
"""

from __future__ import annotations

import os

import numpy as np

_SITE = "/opt/venv/lib/python3.12/site-packages"
_GYM_TEX = f"{_SITE}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures"
_DM_NAT = f"{_SITE}/dm_control/locomotion/arenas/assets/outdoor_natural"
_ADROIT_TEX = f"{_SITE}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures"

# (path, weight) — weight biases patch sampling toward true scene photos
# over surface textures so the corpus isn't texture-dominated.
REAL_PHOTO_SOURCES: tuple[tuple[str, float], ...] = (
    (f"{_SITE}/sklearn/datasets/images/china.jpg", 3.0),
    (f"{_SITE}/sklearn/datasets/images/flower.jpg", 3.0),
    (f"{_SITE}/matplotlib/mpl-data/sample_data/grace_hopper.jpg", 3.0),
    (f"{_SITE}/pygame/docs/generated/_images/camera_rgb.jpg", 2.0),
    (f"{_GYM_TEX}/wood1.png", 1.0),
    (f"{_GYM_TEX}/marble1.png", 1.0),
    (f"{_GYM_TEX}/tile1.png", 1.0),
    (f"{_GYM_TEX}/white_marble_tile.png", 1.0),
    (f"{_GYM_TEX}/white_marble_tile2.png", 1.0),
    (f"{_DM_NAT}/OutdoorGrassFloorD.png", 1.0),
    (f"{_DM_NAT}/OutdoorSkybox2048.png", 1.0),
    # round-5 corpus broadening (VERDICT r4 item 7): adroit-hand material
    # photos — marble slab, crumpled aluminium foil (dense high-frequency
    # texture, the hardest grain-preservation case), brushed metal. The
    # other candidates audited and REJECTED: pygame intro_*.jpg (game
    # screenshots), dm_control dog skin (UV atlas), adroit darkwood
    # (procedurally mirrored), aqt imagenet.png (a paper's table).
    (f"{_ADROIT_TEX}/marble.png", 1.0),
    (f"{_ADROIT_TEX}/foil.png", 1.0),
    (f"{_GYM_TEX}/metal1.png", 1.0),
)


def available_sources() -> list[tuple[str, float]]:
    """Sources present on this machine (the registry is environment data, so
    consumers must tolerate absence — e.g. a slimmer CI image)."""
    return [(p, w) for p, w in REAL_PHOTO_SOURCES if os.path.exists(p)]


_CACHE: dict[str, np.ndarray] = {}


def _load(path: str) -> np.ndarray:
    img = _CACHE.get(path)
    if img is None:
        from PIL import Image

        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
        _CACHE[path] = img
    return img


def real_clean_patches(rng: np.random.Generator, n: int, size: int) -> np.ndarray:
    """[n, size, size, 3] float32 patches cropped from the real-photo corpus.

    Sampling is weighted toward scene photos; crops with almost no detail
    (flat sky/wall regions, std < 0.02) are resampled a few times so the
    metric isn't dominated by patches where PSNR is meaningless. Images
    smaller than ``size`` on a side are upscaled 2x first (camera_rgb at
    320x240 supports 256px patches this way — documented, not hidden).
    """
    sources = available_sources()
    if not sources:
        raise RuntimeError("no real-photo sources present on this machine")
    paths = [p for p, _ in sources]
    weights = np.asarray([w for _, w in sources], np.float64)
    weights /= weights.sum()
    out = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        path = paths[rng.choice(len(paths), p=weights)]
        img = _load(path)
        if min(img.shape[0], img.shape[1]) < size:
            img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        best = None
        for _attempt in range(4):
            y = int(rng.integers(0, img.shape[0] - size + 1))
            x = int(rng.integers(0, img.shape[1] - size + 1))
            patch = img[y : y + size, x : x + size]
            if best is None or patch.std() > best.std():
                best = patch
            if patch.std() >= 0.02:
                best = patch
                break
        out[i] = best
    return out


def real_eval_batch(
    seed: int, n: int, size: int, degradation: str
) -> tuple[np.ndarray, np.ndarray]:
    """(degraded, clean) float32 [n,size,size,3]: real-photo patches through
    the OOD degradation operators (train/ood.py physics)."""
    from .ood import OOD_DEGRADATIONS

    rng = np.random.default_rng(seed)
    clean = real_clean_patches(rng, n, size)
    fn = OOD_DEGRADATIONS[degradation]
    degraded = np.stack([fn(rng, img) for img in clean])
    return degraded, clean
