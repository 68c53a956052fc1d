"""Multi-object tracking: a jit-safe SORT tracker.

Reference parity: /root/reference/src/deepcv/video/tracking.py is an EMPTY
stub (``__all__ = []``, no code beyond the module template), so this module
implements the documented intent of the reference's video package — track
detected boxes across frames — rather than mirroring any reference code.

TPU-first design decisions (vs the classic CPU SORT, arXiv:1602.00763):

* **Fixed-capacity track table.** Classic SORT keeps a Python list of
  tracker objects that grows and shrinks per frame — a dynamic shape XLA
  cannot compile. Here the tracker state is a pytree of ``(max_tracks, …)``
  arrays with an ``active`` mask; births claim inactive slots and deaths
  clear the mask, so every frame is the same static program.
* **Vectorized Kalman filter.** The per-track constant-velocity Kalman
  predict/update (7-state: center x/y, scale, aspect + velocities) is
  ``vmap``-ed over the whole table — batched 7x7 matmuls instead of
  per-object Python loops.
* **Greedy IoU association inside ``lax.fori_loop``.** SORT uses the
  Hungarian algorithm; its O(n^3) augmenting paths are branch-heavy and
  sequential. Greedy best-first matching on the IoU matrix is the standard
  jit-friendly approximation (identical to Hungarian whenever the best
  match is mutual, which dominates in tracking) and is deterministic.
* **``lax.scan`` over frames.** ``track_sequence`` compiles the whole clip
  into one program; detections stream through the scan carry.

The tracker consumes ``(D, 4)`` xyxy boxes per frame (padded, with a
validity mask) — the exact output layout of ``ops/boxes.nms`` and the
detection pipelines — and returns a per-detection track id (-1 when the
detection is padding or the table is full).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from deepcv_tpu.ops.boxes import box_iou

__all__ = ["TrackerState", "init_tracker", "tracker_step", "track_sequence",
           "mot_metrics"]


# ---------------------------------------------------------------- Kalman ---
# SORT's constant-velocity model. State x = [cx, cy, s, r, vcx, vcy, vs]
# (s = area, r = aspect ratio, assumed constant). Measurement z = [cx,cy,s,r].
_DIM_X, _DIM_Z = 7, 4

_F = jnp.eye(_DIM_X).at[0, 4].set(1.0).at[1, 5].set(1.0).at[2, 6].set(1.0)
_H = jnp.eye(_DIM_Z, _DIM_X)
# Noise covariances: the standard SORT settings (velocity components get
# small process noise; scale measurement is noisier than center).
_Q = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 1e-4]))
_R = jnp.diag(jnp.array([1.0, 1.0, 10.0, 10.0]))
_P0 = jnp.diag(jnp.array([10.0, 10.0, 10.0, 10.0, 1e4, 1e4, 1e4]))


def _xyxy_to_z(boxes: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) xyxy -> (…, 4) [cx, cy, area, aspect]."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return jnp.stack([cx, cy, w * h, w / jnp.maximum(h, 1e-6)], axis=-1)


def _x_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(…, 7) state -> (…, 4) xyxy box."""
    s = jnp.maximum(x[..., 2], 1e-6)
    r = jnp.maximum(x[..., 3], 1e-6)
    w = jnp.sqrt(s * r)
    h = s / w
    return jnp.stack([x[..., 0] - 0.5 * w, x[..., 1] - 0.5 * h,
                      x[..., 0] + 0.5 * w, x[..., 1] + 0.5 * h], axis=-1)


def _kalman_predict(mean: jnp.ndarray, cov: jnp.ndarray):
    mean = mean @ _F.T
    cov = jnp.einsum("ij,njk,lk->nil", _F, cov, _F) + _Q
    return mean, cov


def _kalman_update(mean: jnp.ndarray, cov: jnp.ndarray, z: jnp.ndarray):
    """Batched over tracks: mean (T,7), cov (T,7,7), z (T,4)."""
    def one(m, p, zi):
        s = _H @ p @ _H.T + _R
        k = jnp.linalg.solve(s, _H @ p).T          # (7, 4) Kalman gain
        m2 = m + k @ (zi - _H @ m)
        p2 = (jnp.eye(_DIM_X) - k @ _H) @ p
        return m2, p2
    return jax.vmap(one)(mean, cov, z)


# ----------------------------------------------------------------- state ---
class TrackerState(NamedTuple):
    """Fixed-capacity track table (all arrays sized ``(max_tracks, …)``)."""
    mean: jnp.ndarray               # (T, 7) Kalman means
    cov: jnp.ndarray                # (T, 7, 7) Kalman covariances
    active: jnp.ndarray             # (T,) bool — slot holds a live track
    track_id: jnp.ndarray           # (T,) int32 — stable public id
    hits: jnp.ndarray               # (T,) int32 — matched-frame count
    time_since_update: jnp.ndarray  # (T,) int32 — frames since last match
    next_id: jnp.ndarray            # () int32 — id counter


def init_tracker(max_tracks: int = 64) -> TrackerState:
    t = int(max_tracks)
    return TrackerState(
        mean=jnp.zeros((t, _DIM_X)),
        cov=jnp.tile(_P0[None], (t, 1, 1)),
        active=jnp.zeros((t,), bool),
        track_id=jnp.full((t,), -1, jnp.int32),
        hits=jnp.zeros((t,), jnp.int32),
        time_since_update=jnp.zeros((t,), jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
    )


# ----------------------------------------------------------- association ---
def _greedy_match(iou: jnp.ndarray, valid: jnp.ndarray,
                  iou_threshold: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy best-first matching on a (T, D) IoU matrix.

    Returns (track_match (T,), det_match (D,)) with -1 for unmatched.
    ``valid`` masks (track, det) pairs that may match at all.
    """
    t, d = iou.shape
    iou = jnp.where(valid, iou, -1.0)

    def body(_, carry):
        m, tm, dm = carry
        flat = jnp.argmax(m)
        ti, di = flat // d, flat % d
        ok = m[ti, di] >= iou_threshold
        tm = jnp.where(ok, tm.at[ti].set(di.astype(jnp.int32)), tm)
        dm = jnp.where(ok, dm.at[di].set(ti.astype(jnp.int32)), dm)
        m = jnp.where(ok, m.at[ti, :].set(-1.0).at[:, di].set(-1.0), m)
        return m, tm, dm

    tm0 = jnp.full((t,), -1, jnp.int32)
    dm0 = jnp.full((d,), -1, jnp.int32)
    _, tm, dm = lax.fori_loop(0, min(t, d), body, (iou, tm0, dm0))
    return tm, dm


# ------------------------------------------------------------------ step ---
def tracker_step(state: TrackerState, boxes: jnp.ndarray,
                 det_mask: jnp.ndarray, *, iou_threshold: float = 0.3,
                 max_age: int = 3) -> Tuple[TrackerState, jnp.ndarray]:
    """Advance the tracker by one frame.

    Args:
      state: current :class:`TrackerState`.
      boxes: ``(D, 4)`` xyxy detections (padded rows allowed).
      det_mask: ``(D,)`` bool — True where the detection row is real.
      iou_threshold: minimum IoU for a detection↔track association.
      max_age: a track missing for more than this many consecutive frames
        is dropped (reference SORT default is 1; 3 tolerates short
        occlusions).

    Returns:
      ``(new_state, ids)`` where ``ids`` is ``(D,)`` int32 — the track id
      assigned to each detection (-1 for padding rows or when the track
      table is full).
    """
    d = boxes.shape[0]

    # 1. Predict every slot forward (inactive slots predict garbage that the
    #    masks keep out of the association).
    mean, cov = _kalman_predict(state.mean, state.cov)

    # 2. Associate predicted track boxes with detections.
    track_boxes = _x_to_xyxy(mean)
    iou = box_iou(track_boxes, boxes)                       # (T, D)
    valid = state.active[:, None] & det_mask[None, :]
    track_match, det_match = _greedy_match(iou, valid, iou_threshold)
    matched_t = track_match >= 0                            # (T,)

    # 3. Kalman-update matched tracks with their measurement.
    z_all = _xyxy_to_z(boxes)                               # (D, 4)
    z_per_track = z_all[jnp.clip(track_match, 0, d - 1)]    # (T, 4)
    mean_u, cov_u = _kalman_update(mean, cov, z_per_track)
    mean = jnp.where(matched_t[:, None], mean_u, mean)
    cov = jnp.where(matched_t[:, None, None], cov_u, cov)

    hits = state.hits + matched_t.astype(jnp.int32)
    tsu = jnp.where(matched_t, 0, state.time_since_update + 1)

    # 4. Retire tracks unseen for > max_age frames.
    active = state.active & (tsu <= max_age)

    # 5. Births: unmatched valid detections claim inactive slots, in
    #    deterministic (slot-index, detection-index) order.
    t = active.shape[0]
    free = ~active
    # slots sorted free-first, preserving index order within each group
    slot_order = jnp.argsort(jnp.where(free, jnp.arange(t), t + jnp.arange(t)))
    n_free = jnp.sum(free.astype(jnp.int32))
    is_birth = det_mask & (det_match < 0)                   # (D,)
    birth_rank = jnp.cumsum(is_birth.astype(jnp.int32)) - 1  # (D,)
    can_place = is_birth & (birth_rank < n_free)
    birth_slot = slot_order[jnp.clip(birth_rank, 0, t - 1)]  # (D,)

    # scatter births into the table
    slot_det = jnp.full((t,), -1, jnp.int32)
    slot_det = slot_det.at[jnp.where(can_place, birth_slot, t)].set(
        jnp.arange(d, dtype=jnp.int32), mode="drop")
    is_new = slot_det >= 0                                  # (T,)
    z_new = z_all[jnp.clip(slot_det, 0, d - 1)]
    mean_new = jnp.concatenate([z_new, jnp.zeros((t, 3))], axis=-1)
    mean = jnp.where(is_new[:, None], mean_new, mean)
    cov = jnp.where(is_new[:, None, None], _P0[None], cov)
    hits = jnp.where(is_new, 1, hits)
    tsu = jnp.where(is_new, 0, tsu)
    new_ids = state.next_id + jnp.cumsum(is_new.astype(jnp.int32)) - 1
    track_id = jnp.where(is_new, new_ids, state.track_id)
    active = active | is_new
    next_id = state.next_id + jnp.sum(is_new.astype(jnp.int32))

    # 6. Per-detection ids: matched -> existing track id, birth -> new id.
    ids = jnp.full((d,), -1, jnp.int32)
    ids = jnp.where(det_match >= 0,
                    track_id[jnp.clip(det_match, 0, t - 1)], ids)
    placed_id = track_id[jnp.clip(birth_slot, 0, t - 1)]
    ids = jnp.where(can_place, placed_id, ids)

    new_state = TrackerState(mean=mean, cov=cov, active=active,
                             track_id=track_id, hits=hits,
                             time_since_update=tsu, next_id=next_id)
    return new_state, ids


def track_sequence(detections: jnp.ndarray, det_masks: jnp.ndarray, *,
                   max_tracks: int = 64, iou_threshold: float = 0.3,
                   max_age: int = 3) -> jnp.ndarray:
    """Track a whole clip in one compiled program.

    Args:
      detections: ``(F, D, 4)`` xyxy boxes per frame (padded).
      det_masks: ``(F, D)`` bool validity masks.

    Returns:
      ``(F, D)`` int32 track ids per detection (-1 for padding/overflow).
    """
    state = init_tracker(max_tracks)

    def step(s, frame):
        boxes, mask = frame
        s, ids = tracker_step(s, boxes, mask, iou_threshold=iou_threshold,
                              max_age=max_age)
        return s, ids

    _, ids = lax.scan(step, state, (detections, det_masks))
    return ids


def mot_metrics(gt_boxes: jnp.ndarray, gt_ids: jnp.ndarray,
                gt_masks: jnp.ndarray, pred_boxes: jnp.ndarray,
                pred_ids: jnp.ndarray, pred_masks: jnp.ndarray, *,
                iou_threshold: float = 0.5, max_gt_ids: int = 256):
    """CLEAR-MOT evaluation (MOTA, ID switches) — jit-safe, like
    ``ops/boxes.mean_average_precision`` for detection.

    Per frame, predictions are greedily matched to ground truth by IoU
    (>= ``iou_threshold``); unmatched GT are misses (FN), unmatched
    predictions false positives (FP). An ID switch is counted when a GT
    identity that was previously matched to predicted track id A is now
    matched to a different id B (the standard CLEAR definition; the
    last-matched id survives occlusion gaps). The per-identity memory is a
    fixed ``(max_gt_ids,)`` table scanned over frames, so the whole clip
    evaluates in one compiled program.

    Args:
      gt_boxes: ``(F, G, 4)`` xyxy; gt_ids ``(F, G)`` int identity labels in
        ``[0, max_gt_ids)``; gt_masks ``(F, G)`` bool.
      pred_boxes: ``(F, D, 4)``; pred_ids ``(F, D)`` (e.g. the output of
        :func:`track_sequence`); pred_masks ``(F, D)`` bool — rows with
        id < 0 are treated as invalid automatically.

    Returns:
      dict of scalars: ``mota`` = 1 - (FN + FP + IDSW) / num_gt, plus the
      raw ``misses``, ``false_positives``, ``id_switches``, ``num_gt``,
      ``matches`` counts.
    """
    pred_masks = pred_masks & (pred_ids >= 0)

    def frame(carry, inp):
        last_id, fn, fp, idsw, ngt, nmatch = carry
        gb, gi, gm, pb, pi, pm = inp
        iou = box_iou(gb, pb)                              # (G, D)
        valid = gm[:, None] & pm[None, :]
        g_match, d_match = _greedy_match(iou, valid, iou_threshold)
        matched_g = g_match >= 0                            # (G,)
        ngt = ngt + jnp.sum(gm)
        fn = fn + jnp.sum(gm & ~matched_g)
        fp = fp + jnp.sum(pm & (d_match < 0))
        nmatch = nmatch + jnp.sum(matched_g)
        # matched predicted id per GT row (-1 where unmatched)
        pid = jnp.where(matched_g,
                        pi[jnp.clip(g_match, 0, pi.shape[0] - 1)], -1)
        gid = jnp.clip(gi, 0, max_gt_ids - 1)
        prev = last_id[gid]                                 # (G,)
        idsw = idsw + jnp.sum(matched_g & (prev >= 0) & (prev != pid))
        # remember the latest matched id per GT identity
        upd = jnp.where(matched_g, pid, -1)
        last_id = last_id.at[jnp.where(matched_g, gid, max_gt_ids)].set(
            upd, mode="drop")
        return (last_id, fn, fp, idsw, ngt, nmatch), None

    z = jnp.zeros((), jnp.int32)
    init = (jnp.full((max_gt_ids,), -1, jnp.int32), z, z, z, z, z)
    (last_id, fn, fp, idsw, ngt, nmatch), _ = lax.scan(
        frame, init, (gt_boxes, gt_ids.astype(jnp.int32), gt_masks,
                      pred_boxes, pred_ids.astype(jnp.int32), pred_masks))
    mota = 1.0 - (fn + fp + idsw) / jnp.maximum(ngt, 1).astype(jnp.float32)
    return {"mota": mota, "misses": fn, "false_positives": fp,
            "id_switches": idsw, "num_gt": ngt, "matches": nmatch}
