"""Box-op tests: NMS and mAP against independent pure-numpy oracles.

The jnp implementations (ops/boxes.py) are static-shape/masked by design;
the oracles here are written the classic variable-length way, so agreement
checks both the math and the masking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcv_tpu.ops.boxes import (batched_nms, box_iou, mean_average_precision,
                                  nms)


def _ref_iou(a, b):
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iw * ih
    ua = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1]) \
        + max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def _ref_nms(boxes, scores, thr):
    """Classic greedy NMS (torchvision semantics), variable-length."""
    idx = list(np.argsort(-scores))
    keep = np.zeros(len(boxes), bool)
    while idx:
        i = idx.pop(0)
        keep[i] = True
        idx = [j for j in idx if _ref_iou(boxes[i], boxes[j]) <= thr]
    return keep


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_box_iou_matches_reference():
    rng = np.random.default_rng(0)
    a, b = _rand_boxes(rng, 7), _rand_boxes(rng, 5)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[_ref_iou(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # degenerate box -> 0, not NaN
    z = np.zeros((1, 4), np.float32)
    assert np.asarray(box_iou(jnp.asarray(z), jnp.asarray(a)))[0, 0] == 0.0


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_nms_matches_greedy_reference(seed):
    """Fuzz: the masked fori_loop NMS equals the classic variable-length
    greedy algorithm (continuous random scores -> no rank ties)."""
    rng = np.random.default_rng(seed)
    n = 24
    boxes = _rand_boxes(rng, n)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    for thr in (0.3, 0.5, 0.7):
        keep = np.asarray(jax.jit(nms, static_argnums=2)(
            jnp.asarray(boxes), jnp.asarray(scores), thr))
        np.testing.assert_array_equal(keep, _ref_nms(boxes, scores, thr))


def test_nms_score_threshold_masks_low_scores():
    rng = np.random.default_rng(9)
    boxes = _rand_boxes(rng, 10)
    scores = np.linspace(0.05, 0.95, 10).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores),
                          0.5, score_threshold=0.5))
    assert not keep[scores <= 0.5].any()


def test_batched_nms_separates_classes():
    """Two identical overlapping boxes of DIFFERENT classes both survive;
    same-class duplicates are suppressed."""
    b = np.array([[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5],
                  [0.1, 0.1, 0.5, 0.5]], np.float32)
    s = np.array([0.9, 0.8, 0.7], np.float32)
    cls = np.array([0, 1, 0])
    keep = np.asarray(batched_nms(jnp.asarray(b), jnp.asarray(s),
                                  jnp.asarray(cls), 0.5))
    np.testing.assert_array_equal(keep, [True, True, False])


def _ref_map(pb, ps, pc, pv, gb, gc, gv, num_classes, thr=0.5):
    """Independent numpy VOC all-point mAP (variable-length style)."""
    aps = []
    for c in range(num_classes):
        entries = [(ps[i, j], i, pb[i, j]) for i in range(pb.shape[0])
                   for j in range(pb.shape[1]) if pv[i, j] and pc[i, j] == c]
        entries.sort(key=lambda e: -e[0])
        gts = {i: [j for j in range(gb.shape[1]) if gv[i, j] and gc[i, j] == c]
               for i in range(gb.shape[0])}
        n_gt = sum(len(v) for v in gts.values())
        if n_gt == 0:
            continue
        matched = set()
        tp = []
        for _, i, box in entries:
            cands = [(j, _ref_iou(box, gb[i, j])) for j in gts[i]
                     if (i, j) not in matched]
            cands = [x for x in cands if x[1] >= thr]
            if cands:
                j = max(cands, key=lambda x: x[1])[0]
                matched.add((i, j))
                tp.append(1.0)
            else:
                tp.append(0.0)
        tp = np.array(tp)
        if len(tp) == 0:
            aps.append(0.0)
            continue
        cum_tp = np.cumsum(tp)
        cum_fp = np.cumsum(1 - tp)
        recall = cum_tp / n_gt
        precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
        env = np.maximum.accumulate(precision[::-1])[::-1]
        ap = float(np.sum(np.diff(recall, prepend=0.0) * env))
        aps.append(ap)
    return float(np.mean(aps)) if aps else 0.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mean_average_precision_matches_reference(seed):
    """Fuzz: the scan/mask jnp mAP equals the classic per-class greedy
    oracle on random multi-image multi-class scenes."""
    rng = np.random.default_rng(seed)
    n, p, g, c = 3, 12, 6, 3
    pb = np.stack([_rand_boxes(rng, p) for _ in range(n)])
    ps = rng.uniform(0.05, 1.0, (n, p)).astype(np.float32)
    pc = rng.integers(0, c, (n, p))
    pv = rng.random((n, p)) < 0.8
    gb = np.stack([_rand_boxes(rng, g) for _ in range(n)])
    gc = rng.integers(0, c, (n, g))
    gv = rng.random((n, g)) < 0.7
    got, per_class = jax.jit(mean_average_precision, static_argnums=7)(
        jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(pc), jnp.asarray(pv),
        jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(gv), c)
    want = _ref_map(pb, ps, pc, pv, gb, gc, gv, c)
    np.testing.assert_allclose(float(got), want, atol=1e-6)
    assert per_class.shape == (c,)


def test_map_perfect_predictions_is_one():
    rng = np.random.default_rng(5)
    n, g, c = 2, 4, 3
    gb = np.stack([_rand_boxes(rng, g) for _ in range(n)])
    gc = rng.integers(0, c, (n, g))
    gv = np.ones((n, g), bool)
    got, _ = mean_average_precision(
        jnp.asarray(gb), jnp.ones((n, g)), jnp.asarray(gc),
        jnp.ones((n, g), bool), jnp.asarray(gb), jnp.asarray(gc),
        jnp.asarray(gv), c)
    assert float(got) == pytest.approx(1.0, abs=1e-6)


def test_map_all_misses_is_zero():
    rng = np.random.default_rng(6)
    gb = np.stack([_rand_boxes(rng, 4)])
    off = gb + 2.0    # disjoint predictions
    got, _ = mean_average_precision(
        jnp.asarray(off), jnp.ones((1, 4)), jnp.zeros((1, 4), int),
        jnp.ones((1, 4), bool), jnp.asarray(gb), jnp.zeros((1, 4), int),
        jnp.ones((1, 4), bool), 1)
    assert float(got) == 0.0


def test_map50_metric_on_grid_targets():
    """pipelines/detection.map50: logit-inverted GT grids decode back to the
    GT boxes, so the metric is ~1; garbage predictions score ~0."""
    from deepcv_tpu.pipelines.detection import generate_shapes_dataset, map50

    ds = generate_shapes_dataset(n=6, image_size=32, grid=8, seed=3)
    tgt = jnp.asarray(ds.targets)                  # (N, S, S, 5+C)

    def logit(v, eps=1e-4):
        v = jnp.clip(v, eps, 1 - eps)
        return jnp.log(v / (1 - v))

    obj = jnp.where(tgt[..., 0] > 0.5, 12.0, -12.0)[..., None]
    box = logit(tgt[..., 1:5])
    cls = jnp.where(tgt[..., 5:] > 0.5, 10.0, -10.0)
    pred = jnp.concatenate([obj, box, cls], axis=-1)
    assert float(map50(pred, tgt)) == pytest.approx(1.0, abs=1e-3)
    garbage = jnp.full_like(pred, -5.0)
    assert float(map50(garbage, tgt)) <= 0.05


@pytest.mark.parametrize("method", ["gaussian", "linear"])
def test_soft_nms_matches_classic_sequential(method):
    """jit-safe soft-NMS == the classic variable-length sequential
    algorithm (greedy max of current decayed scores, decay the rest)."""
    from deepcv_tpu.ops.boxes import soft_nms

    rng = np.random.default_rng(5)
    n = 24
    cxy = rng.uniform(0.2, 0.8, (n, 2))
    wh = rng.uniform(0.1, 0.4, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)

    def np_iou(a, b):
        iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = iw * ih
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua if ua > 0 else 0.0

    s = scores.copy()
    done = np.zeros(n, bool)
    for _ in range(n):
        j = int(np.argmax(np.where(done, -np.inf, s)))
        for i in range(n):
            if i == j or done[i]:
                continue
            o = np_iou(boxes[j], boxes[i])
            if method == "linear":
                if o > 0.3:
                    s[i] *= 1.0 - o
            else:
                s[i] *= np.exp(-(o ** 2) / 0.5)
        done[j] = True

    out = jax.jit(lambda b, sc: soft_nms(b, sc, method=method))(
        jnp.asarray(boxes), jnp.asarray(scores))
    np.testing.assert_allclose(np.asarray(out), s, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="method"):
        soft_nms(jnp.asarray(boxes), jnp.asarray(scores), method="hard")
