"""SORT tracker tests (pipelines/tracking.py).

Reference parity note: /root/reference/src/deepcv/video/tracking.py is an
empty stub, so these tests pin the rebuilt tracker's own contract: stable
ids under motion, occlusion tolerance up to max_age, deterministic births
and deaths, and jit/scan equivalence (static shapes end to end).
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepcv_tpu.pipelines.tracking import (init_tracker, tracker_step,
                                           track_sequence)


def _box(cx, cy, w=10.0, h=10.0):
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


def _clip(frames):
    """list of list-of-boxes -> padded (F, D, 4) + (F, D) mask."""
    d = max(len(f) for f in frames)
    boxes = np.zeros((len(frames), d, 4), np.float32)
    mask = np.zeros((len(frames), d), bool)
    for i, f in enumerate(frames):
        for j, b in enumerate(f):
            boxes[i, j] = b
            mask[i, j] = True
    return jnp.asarray(boxes), jnp.asarray(mask)


def test_stable_ids_two_parallel_tracks():
    # two objects moving right on separate rows: ids must never switch
    frames = [[_box(20 + 2 * t, 20), _box(20 + 2 * t, 60)] for t in range(12)]
    boxes, mask = _clip(frames)
    ids = np.asarray(track_sequence(boxes, mask, max_tracks=8))
    assert (ids >= 0).all()
    assert (ids[:, 0] == ids[0, 0]).all()
    assert (ids[:, 1] == ids[0, 1]).all()
    assert ids[0, 0] != ids[0, 1]


def test_occlusion_within_max_age_keeps_id():
    # object visible frames 0-4, hidden 5-6, back 7-9: same id throughout
    frames, vis = [], []
    for t in range(10):
        frames.append([_box(20 + 2 * t, 30)])
        vis.append(t not in (5, 6))
    boxes, mask = _clip(frames)
    mask = mask & jnp.asarray(vis)[:, None]
    ids = np.asarray(track_sequence(boxes, mask, max_tracks=4, max_age=3))
    seen = ids[np.asarray(mask)]
    assert (seen == seen[0]).all()


def test_death_after_max_age_then_new_id():
    # hidden for 5 > max_age=2 frames: the reappearance is a NEW track
    frames, vis = [], []
    for t in range(14):
        frames.append([_box(30, 30)])
        vis.append(not 4 <= t < 9)
    boxes, mask = _clip(frames)
    mask = mask & jnp.asarray(vis)[:, None]
    ids = np.asarray(track_sequence(boxes, mask, max_tracks=4, max_age=2))
    assert ids[0, 0] >= 0
    assert ids[13, 0] >= 0
    assert ids[13, 0] != ids[0, 0]
    # and the freed slot was reused without id collision
    assert ids[13, 0] > ids[0, 0]


def test_kalman_velocity_carries_through_occlusion():
    # fast motion + occlusion: only the constant-velocity prediction keeps
    # IoU overlap with the reappearing detection (a static tracker loses it)
    frames, vis = [], []
    for t in range(10):
        frames.append([_box(10 + 6 * t, 30, 12, 12)])
        vis.append(t not in (5, 6))
    boxes, mask = _clip(frames)
    mask = mask & jnp.asarray(vis)[:, None]
    ids = np.asarray(track_sequence(boxes, mask, max_tracks=4, max_age=3,
                                    iou_threshold=0.2))
    seen = ids[np.asarray(mask)]
    assert (seen == seen[0]).all()


def test_table_overflow_yields_minus_one():
    boxes, mask = _clip([[_box(20, 20), _box(20, 60), _box(20, 100)]])
    state = init_tracker(max_tracks=2)
    _, ids = tracker_step(state, boxes[0], mask[0])
    ids = np.asarray(ids)
    assert (ids >= 0).sum() == 2 and (ids == -1).sum() == 1


def test_padding_rows_ignored():
    frames = [[_box(20 + 2 * t, 20)] for t in range(6)]
    boxes, mask = _clip(frames)
    pad = jnp.zeros((6, 3, 4), boxes.dtype)
    boxes = jnp.concatenate([boxes, pad], axis=1)
    mask = jnp.concatenate([mask, jnp.zeros((6, 3), bool)], axis=1)
    ids = np.asarray(track_sequence(boxes, mask, max_tracks=4))
    assert (ids[:, 0] == ids[0, 0]).all() and ids[0, 0] >= 0
    assert (ids[:, 1:] == -1).all()


def test_jit_scan_matches_eager_steps():
    frames = [[_box(20 + 2 * t, 20), _box(80 - 3 * t, 60)] for t in range(8)]
    boxes, mask = _clip(frames)
    jitted = np.asarray(jax.jit(
        lambda b, m: track_sequence(b, m, max_tracks=8))(boxes, mask))
    state = init_tracker(8)
    eager = []
    for t in range(8):
        state, ids = tracker_step(state, boxes[t], mask[t])
        eager.append(np.asarray(ids))
    assert (jitted == np.stack(eager)).all()


def test_mot_metrics_perfect_tracking():
    from deepcv_tpu.pipelines.tracking import mot_metrics
    frames = [[_box(20 + 2 * t, 20), _box(20 + 2 * t, 60)] for t in range(8)]
    boxes, mask = _clip(frames)
    gt_ids = jnp.tile(jnp.array([[3, 7]], jnp.int32), (8, 1))
    m = mot_metrics(boxes, gt_ids, mask, boxes, gt_ids, mask)
    assert float(m["mota"]) == 1.0
    assert int(m["id_switches"]) == 0
    assert int(m["num_gt"]) == 16 and int(m["matches"]) == 16


def test_mot_metrics_id_switch_and_gap():
    from deepcv_tpu.pipelines.tracking import mot_metrics
    frames = [[_box(20 + 2 * t, 20)] for t in range(6)]
    boxes, mask = _clip(frames)
    gt_ids = jnp.zeros((6, 1), jnp.int32)
    # predicted id flips at frame 3 -> exactly one CLEAR id switch
    pred_ids = jnp.array([[5], [5], [5], [9], [9], [9]], jnp.int32)
    m = mot_metrics(boxes, gt_ids, mask, boxes, pred_ids, mask)
    assert int(m["id_switches"]) == 1
    assert abs(float(m["mota"]) - (1.0 - 1.0 / 6.0)) < 1e-6
    # an occlusion gap (missed frames) then SAME id -> no switch, 2 misses
    pm = mask.at[2, 0].set(False).at[3, 0].set(False)
    same = jnp.full((6, 1), 5, jnp.int32)
    m2 = mot_metrics(boxes, gt_ids, mask, boxes, same, pm)
    assert int(m2["id_switches"]) == 0 and int(m2["misses"]) == 2
    # gap then DIFFERENT id -> the pre-gap identity memory flags 1 switch
    flip = jnp.array([[5], [5], [5], [5], [9], [9]], jnp.int32)
    m3 = mot_metrics(boxes, gt_ids, mask, boxes, flip, pm)
    assert int(m3["id_switches"]) == 1


def test_mot_metrics_fp_fn():
    from deepcv_tpu.pipelines.tracking import mot_metrics
    frames = [[_box(20, 20)] for _ in range(4)]
    gt_boxes, gt_mask = _clip(frames)
    gt_ids = jnp.zeros((4, 1), jnp.int32)
    # predictions nowhere near the GT: every frame is 1 FN + 1 FP
    pred = [[_box(200, 200)] for _ in range(4)]
    pb, pm = _clip(pred)
    pid = jnp.ones((4, 1), jnp.int32)
    m = mot_metrics(gt_boxes, gt_ids, gt_mask, pb, pid, pm)
    assert int(m["misses"]) == 4 and int(m["false_positives"]) == 4
    assert abs(float(m["mota"]) - (1.0 - 8.0 / 4.0)) < 1e-6  # can go negative


def test_mot_metrics_end_to_end_with_tracker():
    from deepcv_tpu.pipelines.tracking import mot_metrics
    frames = [[_box(20 + 2 * t, 20), _box(90 - 2 * t, 70)] for t in range(10)]
    boxes, mask = _clip(frames)
    gt_ids = jnp.tile(jnp.array([[0, 1]], jnp.int32), (10, 1))
    pred_ids = track_sequence(boxes, mask, max_tracks=8)
    m = jax.jit(lambda *a: mot_metrics(*a))(boxes, gt_ids, mask,
                                            boxes, pred_ids, mask)
    assert float(m["mota"]) == 1.0 and int(m["id_switches"]) == 0
