"""Batched keypoint-based face alignment (the reference's
facial_preprocessing.py:7-60: estimate a similarity transform from the
detector's 5 MTCNN landmarks to the canonical ArcFace template, warp
the crop, /255-normalize).

The reference aligns one face at a time with cv2.estimateAffinePartial2D
+ cv2.warpAffine.  Here the whole Arrow batch is aligned in three
vectorized numpy steps — no cv2, no per-face Python loop:

1. ``similarity_transforms``: closed-form least-squares similarity
   (rotation+scale+translation, no reflection) from each face's 5
   source landmarks to the template, batched over n faces with einsum.
   This is the classical Procrustes/Umeyama solution restricted to
   2-D similarity: with centered source P' and target Q',
   a = Σ(P'·Q') / Σ|P'|², b = Σ(P'×Q') / Σ|P'|².
2. Invert the transforms analytically (a similarity's inverse is a
   similarity: scale 1/s², conjugate rotation).
3. ``bilinear_sample``: map the fixed 112×112 output grid through each
   inverse transform and gather with bilinear weights — one fancy-index
   gather per corner over the whole batch.

The per-face cost is a handful of FLOPs per output pixel, fully inside
numpy — at 100 TB this stage stays vectorized inside the one fused
mapInPandas vision stage, adding no extra shuffle or Python crossing.
"""

from __future__ import annotations

import numpy as np

# Canonical ArcFace 112x112 5-landmark template (public constants from
# the insightface alignment code; the reference hardcodes the same
# template in facial_preprocessing.py:13-19).
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],   # left_eye
        [73.5318, 51.5014],   # right_eye
        [56.0252, 71.7366],   # nose
        [41.5493, 92.3655],   # mouth_left
        [70.7299, 92.2041],   # mouth_right
    ],
    dtype=np.float32,
)


def similarity_transforms(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Least-squares similarity transform per face, batched.

    src: (n, k, 2) source landmarks; dst: (k, 2) or (n, k, 2) targets.
    Returns (A, t): A (n, 2, 2) rotation·scale matrices and t (n, 2)
    translations such that dst ≈ src @ A.T + t in the least-squares
    sense.  Equivalent to solving, per face, the 2k×4 linear system of
    cv2.estimateAffinePartial2D without RANSAC (all 5 landmarks are
    inliers by construction here)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    if dst.ndim == 2:
        dst = np.broadcast_to(dst, src.shape)
    ms = src.mean(axis=1, keepdims=True)   # (n, 1, 2)
    md = dst.mean(axis=1, keepdims=True)
    p = src - ms
    q = dst - md
    denom = np.einsum("nki,nki->n", p, p)          # Σ|P'|²
    a = np.einsum("nki,nki->n", p, q) / denom      # Σ(x'u' + y'v')
    b = (
        np.einsum("nk,nk->n", p[..., 0], q[..., 1])
        - np.einsum("nk,nk->n", p[..., 1], q[..., 0])
    ) / denom                                      # Σ(x'v' − y'u')
    # A = [[a, -b], [b, a]] acting as dst = A @ src (column vectors);
    # with row-vector points: dst = src @ A.T + t
    A = np.empty((len(src), 2, 2), dtype=np.float64)
    A[:, 0, 0] = a
    A[:, 0, 1] = -b
    A[:, 1, 0] = b
    A[:, 1, 1] = a
    t = md[:, 0] - np.einsum("nij,nj->ni", A, ms[:, 0])
    return A, t


def invert_similarity(
    A: np.ndarray, t: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Analytic inverse of batched similarity transforms: A⁻¹ =
    Aᵀ / (a²+b²); t⁻¹ = −A⁻¹ t."""
    s2 = A[:, 0, 0] ** 2 + A[:, 1, 0] ** 2
    Ainv = np.transpose(A, (0, 2, 1)) / s2[:, None, None]
    tinv = -np.einsum("nij,nj->ni", Ainv, t)
    return Ainv, tinv


def bilinear_sample(
    imgs: np.ndarray, coords: np.ndarray, out_hw: tuple[int, int]
) -> np.ndarray:
    """Gather pixels at fractional source coordinates, batched.

    imgs: (n, H, W, C) float32; coords: (n, h*w, 2) source (x, y) per
    output pixel.  Out-of-bounds samples clamp to the edge (cv2
    BORDER_REPLICATE — the reference's warpAffine default edge
    behavior is close enough for face interiors, and the template
    keeps landmarks well inside the crop)."""
    n, H, W, C = imgs.shape
    h, w = out_hw
    x = np.clip(coords[..., 0], 0.0, W - 1.000001)
    y = np.clip(coords[..., 1], 0.0, H - 1.000001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0).astype(np.float32)[..., None]
    fy = (y - y0).astype(np.float32)[..., None]
    ni = np.arange(n)[:, None]
    p00 = imgs[ni, y0, x0]
    p01 = imgs[ni, y0, x0 + 1]
    p10 = imgs[ni, y0 + 1, x0]
    p11 = imgs[ni, y0 + 1, x0 + 1]
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    out = top * (1.0 - fy) + bot * fy
    return out.reshape(n, h, w, C).astype(np.float32)


def align_crops_batch(
    crops: np.ndarray,
    keypoints: np.ndarray,
    out_hw: tuple[int, int] = (112, 112),
    template: np.ndarray = ARCFACE_TEMPLATE,
) -> np.ndarray:
    """Align a BATCH of raw face crops to the ArcFace template.

    crops: (n, H, W, 3) float32 raw detector patches; keypoints:
    (n, 5, 2) landmark (x, y) in CROP-LOCAL pixel coordinates.
    Returns (n, out_h, out_w, 3) float32 aligned faces — what a
    production ONNX ArcFace encoder consumes
    (facial_preprocessing.py:7-60).
    """
    n = len(crops)
    if n == 0:
        return np.zeros((0, *out_hw, crops.shape[3]), dtype=np.float32)
    A, t = similarity_transforms(keypoints, template)
    Ainv, tinv = invert_similarity(A, t)
    h, w = out_hw
    gy, gx = np.mgrid[0:h, 0:w]
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    # source coords per face: grid @ Ainv.T + tinv
    coords = np.einsum("pj,nij->npi", grid, Ainv) + tinv[:, None, :]
    return bilinear_sample(crops, coords, out_hw)
