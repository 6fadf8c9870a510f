"""Batched keypoint-based face alignment (the reference's
facial_preprocessing.py:7-60 stage: align each detected face from its
MTCNN landmarks before embedding, then /255-normalize).

TWO alignment kernels, both fully vectorized (no cv2, no per-face
Python loop):

* ``method="umeyama"`` (default) — closed-form least-squares
  similarity from all 5 landmarks to the canonical insightface
  ArcFace template.  This is a DELIBERATE algorithmic deviation from
  the reference (SURVEY §2.12): the standard, better-conditioned
  alignment every ArcFace deployment uses, rather than the
  reference's 2-landmark heuristic.
* ``method="eye_angle"`` — the reference's own algorithm
  (facial_preprocessing.py:7-60), batched: rotate about the
  floor-divided eye center by the eye-line angle, scale so the
  eye-center→mouth-center distance fills ``(1 − 2·blank)`` of the
  output height (blank=0.3), translate the eye center to
  (0.5·w, blank·h) — the exact cv2.getRotationMatrix2D + translation
  composition, replayed in closed form.  Interpolation deviates:
  bilinear with edge-clamp here vs the reference's INTER_CUBIC with
  zero-border (documented; immaterial to the fake-encoder parity
  gates, and a real-codec deployment flips the sampler, not the
  transform math).

The reference aligns one face at a time through cv2; here the whole
Arrow batch is aligned in three vectorized numpy steps:

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
# the insightface alignment code).  The reference does NOT use this
# template — its facial_preprocessing.py aligns by eye-angle rotation +
# eye↔mouth-distance scale (see eye_angle_transforms below); the
# template drives only the default "umeyama" method.
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


def eye_angle_transforms(
    keypoints: np.ndarray,
    out_hw: tuple[int, int] = (112, 112),
    blank: float = 0.3,
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's alignment transform
    (facial_preprocessing.py:7-60), batched over n faces.

    Per face: eye_center and mouth_center are the FLOOR-divided
    landmark midpoints (the reference's ``// 2`` — a quirk kept for
    parity); angle = atan2(right_eye−left_eye); scale =
    (1 − 2·blank)·out_h / |mouth_center − eye_center|; the affine is
    cv2.getRotationMatrix2D(eye_center, degrees(angle), scale) with
    its translation column shifted so eye_center lands at
    (0.5·out_w, blank·out_h).  Replayed in closed form:
    alpha = s·cos θ, beta = s·sin θ,
    M = [[alpha, beta, tx], [−beta, alpha, ty]].

    keypoints: (n, 5, 2) in insightface order (left_eye, right_eye,
    nose, mouth_left, mouth_right) — the reference ignores the nose.
    Returns (A, t) FORWARD transforms (dst = src @ A.T + t), same
    contract as :func:`similarity_transforms`.
    """
    kps = np.asarray(keypoints, dtype=np.float64)
    le, re = kps[:, 0], kps[:, 1]
    ml, mr = kps[:, 3], kps[:, 4]
    eye_c = np.floor_divide(le + re, 2.0)
    mouth_c = np.floor_divide(ml + mr, 2.0)
    theta = np.arctan2(re[:, 1] - le[:, 1], re[:, 0] - le[:, 0])
    d = mouth_c - eye_c
    dist = np.sqrt((d * d).sum(axis=1))
    if np.any(dist == 0):
        raise ValueError(
            "degenerate keypoints: eye center equals mouth center"
        )
    h, w = out_hw
    scale = (1.0 - 2.0 * blank) * h / dist
    alpha = scale * np.cos(theta)
    beta = scale * np.sin(theta)
    A = np.empty((len(kps), 2, 2), dtype=np.float64)
    A[:, 0, 0] = alpha
    A[:, 0, 1] = beta
    A[:, 1, 0] = -beta
    A[:, 1, 1] = alpha
    # getRotationMatrix2D's translation about eye_center ...
    cx, cy = eye_c[:, 0], eye_c[:, 1]
    t = np.stack(
        [
            (1.0 - alpha) * cx - beta * cy,
            beta * cx + (1.0 - alpha) * cy,
        ],
        axis=1,
    )
    # ... plus the reference's M[:, 2] += (target − eye_center) shift
    t[:, 0] += 0.5 * w - cx
    t[:, 1] += blank * h - cy
    return A, t


def align_crops_batch(
    crops: np.ndarray,
    keypoints: np.ndarray,
    out_hw: tuple[int, int] = (112, 112),
    template: np.ndarray = ARCFACE_TEMPLATE,
    method: str = "umeyama",
    blank: float = 0.3,
) -> np.ndarray:
    """Align a BATCH of raw face crops for the embedding stage.

    crops: (n, H, W, 3) float32 raw detector patches; keypoints:
    (n, 5, 2) landmark (x, y) in CROP-LOCAL pixel coordinates.
    Returns (n, out_h, out_w, 3) float32 aligned faces — what a
    production ONNX ArcFace encoder consumes.

    ``method="umeyama"`` (default): least-squares similarity to
    ``template`` — the engine's standard alignment (a documented
    deviation from the reference, SURVEY §2.12).
    ``method="eye_angle"``: the reference's own transform
    (facial_preprocessing.py:7-60) for crop-level parity runs;
    ``blank`` is its scaling parameter (reference default 0.3).
    Both share the inverse-map bilinear sampler — a similarity's
    inverse is analytic either way.
    """
    n = len(crops)
    if n == 0:
        return np.zeros((0, *out_hw, crops.shape[3]), dtype=np.float32)
    if method == "umeyama":
        A, t = similarity_transforms(keypoints, template)
    elif method == "eye_angle":
        A, t = eye_angle_transforms(keypoints, out_hw, blank=blank)
    else:
        raise ValueError(
            f"method must be 'umeyama' or 'eye_angle', got {method!r}"
        )
    Ainv, tinv = invert_similarity(A, t)
    h, w = out_hw
    gy, gx = np.mgrid[0:h, 0:w]
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    # source coords per face: grid @ Ainv.T + tinv
    coords = np.einsum("pj,nij->npi", grid, Ainv) + tinv[:, None, :]
    return bilinear_sample(crops, coords, out_hw)
