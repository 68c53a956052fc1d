"""Classical keypoints (Harris/Shi-Tomasi + oriented BRIEF) and the
classical-vs-learned matching harness — reference README.md:128's
'compare against SIFT, ORB' TODO, never started there."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.pipelines.classical_features import (
    brief_pattern, detect_and_describe, evaluate_matchers, harris_response,
    intensity_orientations, match_hamming, matching_precision, orb_descriptors,
    orb_matcher)
from deepcv_tpu.pipelines.keypoints import extract_keypoints


def _textured_image(h=72, w=72, seed=3):
    """A corner-rich test image: random blocky texture (piecewise-constant
    cells produce strong, localizable Harris corners)."""
    rng = np.random.default_rng(seed)
    cells = rng.uniform(0.0, 1.0, size=(h // 8, w // 8))
    img = np.kron(cells, np.ones((8, 8)))[:h, :w]
    img += rng.normal(0.0, 0.01, size=img.shape)
    return jnp.asarray(img, jnp.float32)


def _translate(img, ty, tx):
    """Integer-translate with edge padding; returns image + the true
    homography mapping a-coords (x, y, 1) -> b-coords."""
    out = jnp.roll(img, (ty, tx), axis=(0, 1))
    h_true = jnp.asarray([[1.0, 0.0, tx], [0.0, 1.0, ty], [0.0, 0.0, 1.0]],
                         jnp.float32)
    return out, h_true


def test_harris_peaks_on_corners_not_edges():
    img = jnp.zeros((48, 48), jnp.float32).at[16:32, 16:32].set(1.0)
    resp = harris_response(img)
    corner = float(resp[16, 16])
    edge = float(resp[16, 24])      # mid-edge of the square
    flat = float(resp[4, 4])
    assert corner > 1e-3            # strong positive response at the corner
    assert edge < 0.0               # Harris: edges score negative
    assert abs(flat) < 1e-6         # flat regions are ~zero
    assert corner > 100 * abs(flat)


def test_harris_batch_matches_single():
    img = _textured_image()
    batch = jnp.stack([img, img.T])
    rb = harris_response(batch)
    np.testing.assert_allclose(np.asarray(rb[0]),
                               np.asarray(harris_response(img)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rb[1]),
                               np.asarray(harris_response(img.T)), rtol=1e-6)


def test_shi_tomasi_min_eigenvalue_oracle():
    img = _textured_image(h=40, w=40)
    st = np.asarray(harris_response(img, method="shi_tomasi"))
    # oracle: eigenvalues of the explicit structure tensor at a few pixels
    dy, dx = np.gradient(np.asarray(img))
    for (y, x) in [(10, 10), (20, 17), (31, 8)]:
        win = slice(y - 2, y + 3), slice(x - 2, x + 3)
        m = np.array([[np.mean(dx[win] ** 2), np.mean((dx * dy)[win])],
                      [np.mean((dx * dy)[win]), np.mean(dy[win] ** 2)]])
        np.testing.assert_allclose(st[y, x], np.linalg.eigvalsh(m)[0],
                                   atol=1e-5)


def test_hamming_matmul_identity():
    """match_hamming's matmul distance == explicit Hamming distance."""
    rng = np.random.default_rng(0)
    da = np.where(rng.random((20, 64)) > 0.5, 1.0, -1.0).astype(np.float32)
    db = np.where(rng.random((30, 64)) > 0.5, 1.0, -1.0).astype(np.float32)
    hamming = ((da[:, None, :] != db[None, :, :]).sum(-1))      # (20, 30)
    m, valid = match_hamming(jnp.asarray(da), jnp.asarray(db), mutual=False)
    np.testing.assert_array_equal(np.asarray(m), hamming.argmin(1))
    # threshold mapping: max_hamming keeps exactly the pairs under it
    thr = int(np.median(hamming.min(1)))
    m2, valid2 = match_hamming(jnp.asarray(da), jnp.asarray(db), mutual=False,
                               max_hamming=thr)
    np.testing.assert_array_equal(np.asarray(valid2),
                                  hamming.min(1) <= thr)


def test_orientation_rotates_with_image():
    """Intensity-centroid orientation tracks a 90° image rotation."""
    img = _textured_image(h=33, w=33)
    c = jnp.asarray([[16, 16]])
    t0 = float(intensity_orientations(img, c, radius=6)[0])
    t90 = float(intensity_orientations(jnp.rot90(img), c, radius=6)[0])
    diff = (t90 - t0 + np.pi) % (2 * np.pi) - np.pi
    # rot90 rotates content by +90°; centroid angle moves by the same amount
    assert abs(abs(diff) - np.pi / 2) < 0.35


def test_descriptor_stability_under_orientation():
    """Steered BRIEF: descriptors at the same physical point agree between
    the image and its 90°-rotated copy far above chance."""
    img = _textured_image(h=64, w=64, seed=5)
    rot = jnp.rot90(img)                      # (y, x) -> (63 - x, y)
    resp = harris_response(img)
    coords, scores = extract_keypoints(resp[None], k=24, nms_window=5)
    coords = coords[0]
    # keep keypoints away from the border so both patches are interior
    keep = ((coords[:, 0] > 16) & (coords[:, 0] < 48)
            & (coords[:, 1] > 16) & (coords[:, 1] < 48))
    coords_rot = jnp.stack([63 - coords[:, 1], coords[:, 0]], -1)
    th_a = intensity_orientations(img, coords)
    th_b = intensity_orientations(rot, coords_rot)
    da = orb_descriptors(img, coords, th_a, n_tests=128)
    db = orb_descriptors(rot, coords_rot, th_b, n_tests=128)
    agree = np.asarray((da == db).mean(-1))[np.asarray(keep)]
    assert agree.size >= 5
    assert agree.mean() > 0.72   # chance = 0.5; unsteered BRIEF would fail


def test_end_to_end_translation_matching():
    img = _textured_image(h=72, w=72, seed=7)
    moved, h_true = _translate(img, 3, 5)
    ca, da, va = detect_and_describe(img, k=96, n_tests=128)
    cb, db, vb = detect_and_describe(moved, k=96, n_tests=128)
    m, valid = match_hamming(da, db, mutual=True)
    valid = valid & va & vb[m]
    stats = matching_precision(ca, cb, m, valid, h_true, tol=2.0)
    assert int(stats["n_matches"]) >= 20
    assert float(stats["precision"]) >= 0.7


def test_evaluate_matchers_harness_classical_vs_learned_footing():
    """The harness scores ANY matcher with the same rule: the classical ORB
    pipeline and a (random-weight) dense-feature matcher both run."""
    from deepcv_tpu.pipelines.keypoints import extract_dense_descriptors, \
        match_descriptors
    img = _textured_image(h=48, w=48, seed=11)
    moved, h_true = _translate(img, 2, -3)

    def learned_like(a, b):
        # stand-in for an encoder: raw 4x4-patch grid descriptors
        def grid_desc(x):
            fm = x.reshape(12, 4, 12, 4).transpose(0, 2, 1, 3
                                                   ).reshape(1, 12, 12, 16)
            return extract_dense_descriptors(jnp.asarray(fm))[0]
        da, db = grid_desc(np.asarray(a)), grid_desc(np.asarray(b))
        m, v = match_descriptors(da, db, mutual=True)
        yy, xx = np.meshgrid(np.arange(12) * 4 + 2, np.arange(12) * 4 + 2,
                             indexing="ij")
        coords = jnp.asarray(np.stack([yy.ravel(), xx.ravel()], -1))
        return coords, coords, m, v

    res = evaluate_matchers(img, moved, h_true,
                            {"orb": orb_matcher(k=64, n_tests=128),
                             "grid": learned_like}, tol=4.0)
    assert set(res) == {"orb", "grid"}
    for stats in res.values():
        assert set(stats) == {"n_matches", "n_correct", "precision"}
        assert stats["n_matches"] >= 1
    assert res["orb"]["precision"] >= 0.5


def test_brief_pattern_deterministic_and_bounded():
    p1, p2 = brief_pattern(64, 31), brief_pattern(64, 31)
    np.testing.assert_array_equal(p1, p2)
    assert np.abs(p1).max() <= 15
    assert p1.shape == (64, 2, 2)


def test_unknown_method_rejected():
    with pytest.raises(ValueError, match="corner method"):
        harris_response(jnp.zeros((8, 8)), method="susan")
