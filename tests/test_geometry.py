"""Stabilization / stitching / synchronization (working implementations of
the reference's empty WIP packages)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcv_tpu.pipelines.geometry import (
    phase_correlation, stabilize_video, estimate_homography,
    ransac_homography, stitch_pair, synchronize_sequences,
)

H_TRUE = jnp.array([[1.02, 0.03, 4.0], [-0.02, 0.98, -2.0],
                    [1e-4, -2e-4, 1.0]])


def _project(H, p):
    q = jnp.concatenate([p, jnp.ones((p.shape[0], 1))], -1) @ H.T
    return q[:, :2] / q[:, 2:3]


def test_phase_correlation_recovers_shift():
    rng = np.random.default_rng(0)
    base = rng.random((32, 32)).astype(np.float32)
    shifted = np.roll(base, (3, -5), axis=(0, 1))
    d = phase_correlation(jnp.asarray(shifted), jnp.asarray(base))
    assert tuple(np.asarray(d)) == (3.0, -5.0)


def test_dlt_homography_exact():
    rng = np.random.default_rng(1)
    pa = jnp.asarray(rng.random((8, 2)) * 30, jnp.float32)
    pb = _project(H_TRUE, pa)
    H = estimate_homography(pa, pb)
    assert float(jnp.abs(H - H_TRUE).max()) < 1e-4


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(0)
    pa = jnp.asarray(rng.random((50, 2)) * 30, jnp.float32)
    pb = _project(H_TRUE, pa)
    pb = pb.at[:15].add(jnp.asarray(rng.normal(0, 10, (15, 2)), jnp.float32))
    H, inl = ransac_homography(pa, pb, threshold=1.0,
                               key=jax.random.PRNGKey(1))
    assert float(jnp.abs(H - H_TRUE).max()) < 1e-3
    assert int(inl.sum()) == 35                 # exactly the clean points
    assert not bool(inl[:15].any())


def test_stabilize_reduces_jitter():
    rng = np.random.default_rng(0)
    base = rng.random((32, 32)).astype(np.float32)
    jitter = rng.integers(-3, 4, (12, 2))
    jitter[0] = 0
    frames = np.stack([np.roll(np.tile(base[..., None], 3), tuple(j),
                               axis=(0, 1)) for j in jitter])
    stab, traj = stabilize_video(jnp.asarray(frames), smoothing=7)
    # estimated trajectory matches the injected jitter exactly
    np.testing.assert_array_equal(np.asarray(traj), jitter.astype(np.float32))
    d_in = float(jnp.abs(jnp.diff(jnp.asarray(frames), axis=0)).mean())
    d_out = float(jnp.abs(jnp.diff(stab[:, 4:-4, 4:-4], axis=0)).mean())
    assert d_out < 0.5 * d_in


def test_stitch_pair_translation():
    rng = np.random.default_rng(0)
    # aperiodic smooth texture: periodic scenes make matching ambiguous
    noise = rng.normal(0, 1, (48, 96, 3))
    try:
        from scipy.ndimage import gaussian_filter
        scene = np.stack([gaussian_filter(noise[..., c], 2.0)
                          for c in range(3)], -1)
    except ImportError:                         # box-blur fallback
        k = np.ones((5, 5)) / 25.0
        scene = noise
        for _ in range(3):
            scene = np.stack([np.real(np.fft.ifft2(
                np.fft.fft2(scene[..., c]) * np.fft.fft2(k, scene.shape[:2])))
                for c in range(3)], -1)
    scene = ((scene - scene.min()) / (scene.max() - scene.min())).astype(np.float32)
    view_a, view_b = scene[:, :64], scene[:, 32:96]
    pano, H_ab, inl = stitch_pair(jnp.asarray(view_a), jnp.asarray(view_b),
                                  k=96, threshold=2.0,
                                  key=jax.random.PRNGKey(0))
    # pure +32px horizontal translation between the views
    assert abs(float(H_ab[0, 2]) + 32.0) < 1.0
    assert float(jnp.abs(pano[:, :96] - scene).mean()) < 0.02
    assert int(inl.sum()) >= 8


def test_synchronize_sequences_lag():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.random((40, 16)), jnp.float32)
    lag, scores = synchronize_sequences(emb, emb[5:30], max_lag=10)
    assert lag == 5
    assert scores.shape == (21,)
    lag2, _ = synchronize_sequences(emb[7:], emb, max_lag=10)
    assert lag2 == -7


def test_synchronize_audio_recovers_offset():
    """Two recordings of the same click pattern, one delayed by a known
    number of video frames, must align through the onset-envelope front end
    (reference synchronization_WIP/audio.py intent)."""
    from deepcv_tpu.pipelines.geometry import (audio_onset_envelope,
                                               synchronize_audio)
    sr, fps = 8000, 25.0
    hop = int(sr / fps)
    rng = np.random.default_rng(3)
    t = np.arange(6 * sr)
    base = 0.01 * rng.standard_normal(t.shape).astype(np.float32)
    # clicks (decaying tones) at irregular frame positions
    for fpos in (10, 23, 41, 57, 88, 104, 131):
        s = fpos * hop
        dur = np.arange(400)
        base[s:s + 400] += (np.sin(0.3 * dur) *
                            np.exp(-dur / 90)).astype(np.float32)
    delay_frames = 9
    a = base
    b = np.concatenate([np.zeros(delay_frames * hop, np.float32), base])
    lag, lag_s, scores = synchronize_audio(a, b, sr, fps=fps, max_lag_s=1.0)
    # b is a delayed: b[t] ~ a[t - delay] => lag == -delay_frames
    assert lag == -delay_frames
    assert abs(lag_s - (-delay_frames / fps)) < 1e-6
    emb = audio_onset_envelope(a, sr, fps=fps)
    assert emb.shape[1] == 64 and emb.shape[0] > 100


# --------------------------------------------------------------------------- #
# Watermark removal (reference README.md:166 TODO line)
# --------------------------------------------------------------------------- #

def _watermarked_clip(t=64, s=32, alpha=0.6, seed=0):
    rng = np.random.default_rng(seed)
    clean = rng.random((t, s, s, 3)).astype(np.float32)
    a = np.zeros((s, s), np.float32)
    a[8:20, 10:26] = alpha                      # block watermark
    a[12:16, 14:22] = 0.0                       # with a hole (logo-like)
    w = np.zeros((s, s, 3), np.float32)
    w[..., 0], w[..., 1], w[..., 2] = 0.9, 0.2, 0.5
    blended = (1 - a[None, ..., None]) * clean + a[None, ..., None] * w
    return clean, blended.astype(np.float32), a, w


def test_watermark_alpha_matte_recovered():
    from deepcv_tpu.pipelines.geometry import remove_watermark
    clean, blended, a_true, _ = _watermarked_clip()
    _, alpha, wm = remove_watermark(jnp.asarray(blended))
    err = np.abs(np.asarray(alpha) - a_true)
    assert err.mean() < 0.03, err.mean()
    # watermark color recovered inside the matte
    inside = a_true > 0
    assert np.abs(np.asarray(wm)[inside] -
                  np.array([0.9, 0.2, 0.5])).mean() < 0.1


def test_watermark_removal_restores_background():
    from deepcv_tpu.pipelines.geometry import remove_watermark
    clean, blended, a_true, _ = _watermarked_clip()
    restored, alpha, _ = remove_watermark(jnp.asarray(blended))
    restored = np.asarray(restored)
    inside = a_true > 0
    mse_before = np.mean((blended[:, inside] - clean[:, inside]) ** 2)
    mse_after = np.mean((restored[:, inside] - clean[:, inside]) ** 2)
    assert mse_after < 0.05 * mse_before, (mse_before, mse_after)
    # pixels outside the matte pass through (exact: alpha floored to 0)
    outside = a_true == 0
    np.testing.assert_allclose(restored[:, outside], blended[:, outside],
                               atol=1e-5)


def test_watermark_removal_input_validation():
    from deepcv_tpu.pipelines.geometry import remove_watermark
    with pytest.raises(ValueError, match="T>=2"):
        remove_watermark(jnp.zeros((32, 32, 3)))
