"""Classical (non-learned) keypoint detection, description and matching.

The reference planned to "implement basic image feature/keypoints detection
and matching and compare it against classical/non-ML vision approaches like
SIFT, ORB, ..." (reference README.md:128) but never started the classical
side. This module builds it TPU-first:

- **Harris / Shi-Tomasi** corner responses as batched convolutions — pure
  VPU work, vmappable over the batch, sharing `extract_keypoints`' max-pool
  NMS + `top_k` with the learned detector so both pipelines select
  keypoints identically.
- **Oriented-BRIEF (ORB) binary descriptors** (Rublee et al., ICCV 2011):
  orientation from the intensity centroid, binary intensity tests
  bilinear-sampled at per-keypoint-rotated offsets. Descriptors are stored
  as ±1 vectors so **Hamming distance is a matmul**: for a, b ∈ {±1}^D,
  ``hamming(a, b) = (D - a·b) / 2`` — all-pairs binary matching rides the
  MXU through the exact same `match_descriptors` dot-product kernel the
  learned (cosine) descriptors use. No popcount, no bit packing, no
  gather-heavy brute force.
- **A common evaluation harness** (`matching_precision`,
  `evaluate_matchers`) scoring any (detect+describe) producer against a
  known ground-truth homography, so classical and learned matchers are
  compared on the same footing — the comparison the reference TODO asked
  for.

Everything is static-shape and jit-safe: keypoint count ``k`` and test
count ``n_tests`` are compile-time constants; invalid detections carry a
False entry in the returned mask instead of shrinking any array.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepcv_tpu.pipelines.keypoints import extract_keypoints, \
    match_descriptors

__all__ = ["harris_response", "detect_and_describe", "orb_descriptors",
           "intensity_orientations", "match_hamming", "matching_precision",
           "evaluate_matchers", "brief_pattern"]


# --------------------------------------------------------------------------- #
# Corner responses
# --------------------------------------------------------------------------- #

def _smooth(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Box-filter a (H, W) map with two rank-1 convs (separable window)."""
    # Separable filtering as two 1-D convolutions keeps the work O(window)
    # per pixel instead of O(window^2); XLA fuses both passes.
    if window % 2 == 0:
        # even pad would yield an off-by-one output shape (silently wrong
        # keypoint coordinates downstream)
        raise ValueError(f"smoothing window must be odd, got {window}")
    k = jnp.ones((window,), x.dtype) / window
    pad = window // 2
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                 in_axes=1, out_axes=1)(xp)
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(xp)


def harris_response(gray: jnp.ndarray, k: float = 0.05, window: int = 5,
                    method: str = "harris") -> jnp.ndarray:
    """Corner response of a (H, W) or (N, H, W) grayscale image.

    ``method='harris'``: det(M) - k·tr(M)²;  ``method='shi_tomasi'``: the
    smaller structure-tensor eigenvalue (Good Features to Track). Both from
    the box-smoothed structure tensor of central-difference gradients.
    """
    if gray.ndim == 3:
        return jax.vmap(lambda g: harris_response(g, k, window, method))(gray)
    dy, dx = jnp.gradient(gray)
    ixx = _smooth(dx * dx, window)
    iyy = _smooth(dy * dy, window)
    ixy = _smooth(dx * dy, window)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    if method == "shi_tomasi":
        # min eigenvalue of [[ixx, ixy], [ixy, iyy]]
        return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    if method != "harris":
        raise ValueError(f"unknown corner method '{method}' "
                         "(harris|shi_tomasi)")
    return det - k * tr * tr


# --------------------------------------------------------------------------- #
# Oriented BRIEF
# --------------------------------------------------------------------------- #

def brief_pattern(n_tests: int = 256, patch_size: int = 31,
                  seed: int = 71) -> np.ndarray:
    """The (n_tests, 2, 2) BRIEF test pattern as (dy, dx) offset pairs.

    Gaussian-distributed offsets (sigma = patch/5, the BRIEF paper's G-II
    layout), deterministically seeded so descriptors are reproducible
    across processes, clipped inside the patch radius. Returned as numpy —
    it is a compile-time constant baked into the jitted program.
    """
    rng = np.random.default_rng(seed)
    r = patch_size // 2
    pts = rng.normal(0.0, patch_size / 5.0, size=(n_tests, 2, 2))
    return np.clip(pts, -r, r)


def _bilinear_sample(gray: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample an (H, W) image at float (..., 2) (y, x) points (edge clamp)."""
    h, w = gray.shape
    y = jnp.clip(pts[..., 0], 0.0, h - 1.0)
    x = jnp.clip(pts[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy, wx = y - y0, x - x0
    return ((1 - wy) * (1 - wx) * gray[y0, x0]
            + (1 - wy) * wx * gray[y0, x1]
            + wy * (1 - wx) * gray[y1, x0]
            + wy * wx * gray[y1, x1])


def intensity_orientations(gray: jnp.ndarray, coords: jnp.ndarray,
                           radius: int = 4) -> jnp.ndarray:
    """Per-keypoint orientation from the intensity centroid (ORB §3.2).

    theta = atan2(m01, m10) with m_pq = sum x^p y^q I(x, y) over a circular
    window of ``radius`` centered on each (y, x) keypoint. Returns (K,)
    angles in radians.
    """
    size = 2 * radius + 1
    gp = jnp.pad(gray, radius, mode="edge")
    offs = jnp.arange(size, dtype=jnp.float32) - radius
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    circular = ((oy * oy + ox * ox) <= radius * radius).astype(gray.dtype)

    def one(c):
        patch = jax.lax.dynamic_slice(gp, (c[0], c[1]), (size, size)) * circular
        m10 = jnp.sum(ox * patch)
        m01 = jnp.sum(oy * patch)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(coords.astype(jnp.int32))


def orb_descriptors(gray: jnp.ndarray, coords: jnp.ndarray,
                    orientations: Optional[jnp.ndarray] = None,
                    n_tests: int = 256, patch_size: int = 31,
                    blur_window: int = 3) -> jnp.ndarray:
    """Oriented-BRIEF descriptors at (K, 2) (y, x) keypoints -> (K, n_tests)
    of ±1 (float32, MXU-matchable — see module docstring for the Hamming
    identity).

    The image is pre-smoothed (BRIEF's noise-sensitivity fix), the test
    pattern is rotated by each keypoint's orientation (steered BRIEF), and
    both test points of every pair are bilinear-sampled in one vectorized
    gather.
    """
    pattern = jnp.asarray(brief_pattern(n_tests, patch_size), gray.dtype)
    smoothed = _smooth(gray, blur_window) if blur_window > 1 else gray
    if orientations is None:
        orientations = jnp.zeros((coords.shape[0],), gray.dtype)
    c, s = jnp.cos(orientations), jnp.sin(orientations)        # (K,)
    dy, dx = pattern[..., 0], pattern[..., 1]                  # (T, 2)
    # rotate offsets: standard image-plane rotation of (dx, dy) by theta
    ry = dx[None] * s[:, None, None] + dy[None] * c[:, None, None]  # (K, T, 2)
    rx = dx[None] * c[:, None, None] - dy[None] * s[:, None, None]
    base = coords.astype(gray.dtype)[:, None, None, :]         # (K, 1, 1, 2)
    pts = jnp.stack([base[..., 0] + ry, base[..., 1] + rx], -1)  # (K, T, 2, 2)
    vals = _bilinear_sample(smoothed, pts)                     # (K, T, 2)
    return jnp.where(vals[..., 0] > vals[..., 1], 1.0, -1.0
                     ).astype(jnp.float32)


@partial(jax.jit, static_argnames=("k", "n_tests", "method", "nms_window",
                                   "orientation_radius"))
def detect_and_describe(image: jnp.ndarray, k: int = 256, n_tests: int = 256,
                        method: str = "harris", nms_window: int = 5,
                        orientation_radius: int = 4,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full classical pipeline on one (H, W[, C]) image in one jitted
    program: corner response -> NMS top-k -> orientations -> ORB
    descriptors. Returns (coords (k, 2) as (y, x), descriptors (k, n_tests)
    of ±1, valid (k,) bool — False rows are sub-threshold NMS slots)."""
    gray = image.mean(-1) if image.ndim == 3 else image
    gray = gray.astype(jnp.float32)
    resp = harris_response(gray, method=method)
    coords, scores = extract_keypoints(resp[None], k=k, nms_window=nms_window)
    coords, scores = coords[0], scores[0]
    theta = intensity_orientations(gray, coords, radius=orientation_radius)
    desc = orb_descriptors(gray, coords, theta, n_tests=n_tests)
    return coords, desc, jnp.isfinite(scores)


def match_hamming(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                  mutual: bool = True, max_hamming: Optional[int] = None,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs Hamming matching of ±1 descriptors via the learned-pipeline
    matmul matcher.

    For unit-scaled d/sqrt(D) vectors, ||a - b||² = 2 - 2 a·b = 4·h/D with h
    the Hamming distance, so `match_descriptors`' cosine argmax IS the
    Hamming argmin and ``max_hamming`` maps to ``max_distance =
    2·sqrt(h/D)``. One (A, D) x (D, B) matmul on the MXU.
    """
    d = desc_a.shape[-1]
    scale = 1.0 / math.sqrt(d)
    max_distance = (2.0 * math.sqrt(max_hamming / d)
                    if max_hamming is not None else None)
    return match_descriptors(desc_a * scale, desc_b * scale, mutual=mutual,
                             max_distance=max_distance)


# --------------------------------------------------------------------------- #
# Common evaluation harness (classical vs learned, same footing)
# --------------------------------------------------------------------------- #

def matching_precision(coords_a: jnp.ndarray, coords_b: jnp.ndarray,
                       matches: jnp.ndarray, valid: jnp.ndarray,
                       h_true: jnp.ndarray, tol: float = 3.0,
                       ) -> Dict[str, jnp.ndarray]:
    """Score putative matches against a ground-truth homography.

    ``h_true`` maps homogeneous (x, y, 1) points of image a into image b.
    A match is correct when the matched b keypoint lies within ``tol``
    pixels of the projected a keypoint. Returns n_matches / n_correct /
    precision (all 0-d arrays; jit-safe)."""
    pa = coords_a[:, ::-1].astype(jnp.float32)                 # (K, 2) (x, y)
    pb = coords_b[matches][:, ::-1].astype(jnp.float32)
    proj = jnp.concatenate([pa, jnp.ones_like(pa[:, :1])], -1) @ h_true.T
    proj = proj[:, :2] / (proj[:, 2:3] + 1e-12)
    err = jnp.linalg.norm(proj - pb, axis=-1)
    correct = valid & (err <= tol)
    n_valid = jnp.sum(valid)
    return {"n_matches": n_valid,
            "n_correct": jnp.sum(correct),
            "precision": jnp.sum(correct) / jnp.maximum(n_valid, 1)}


def evaluate_matchers(img_a: jnp.ndarray, img_b: jnp.ndarray,
                      h_true: jnp.ndarray,
                      matchers: Mapping[str, Callable], tol: float = 3.0,
                      ) -> Dict[str, Dict[str, float]]:
    """Run every matcher on the same image pair and score it against the
    ground-truth homography.

    Each matcher is ``fn(img_a, img_b) -> (coords_a, coords_b, matches,
    valid)`` — the classical pipeline and any learned detector/descriptor
    both reduce to this signature, which is the whole point: one scoring
    rule for the reference's 'CNN features vs SIFT/ORB' comparison."""
    out: Dict[str, Dict[str, float]] = {}
    for name, fn in matchers.items():
        ca, cb, m, v = fn(img_a, img_b)
        stats = matching_precision(ca, cb, m, v, h_true, tol=tol)
        out[name] = {k: float(val) for k, val in stats.items()}
    return out


def orb_matcher(k: int = 256, n_tests: int = 256, mutual: bool = True,
                max_hamming: Optional[int] = None) -> Callable:
    """The classical pipeline in `evaluate_matchers` signature form."""
    def fn(img_a, img_b):
        ca, da, va = detect_and_describe(img_a, k=k, n_tests=n_tests)
        cb, db, vb = detect_and_describe(img_b, k=k, n_tests=n_tests)
        m, valid = match_hamming(da, db, mutual=mutual,
                                 max_hamming=max_hamming)
        return ca, cb, m, valid & va & vb[m]
    return fn
