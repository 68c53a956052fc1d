"""Wave function collapse (data/wfc.py) — reference README.md:162 TODO.

Oracle: ``validate_tilemap`` (plain numpy) checks every generated neighbor
pair against the adjacency; generations must satisfy constraints exactly.
"""
import jax
import numpy as np
import pytest

from deepcv_tpu.data.wfc import (adjacency_from_exemplar, sample_tilemaps,
                                 validate_tilemap, wave_function_collapse)


def _checkerboard(n=6):
    return (np.add.outer(np.arange(n), np.arange(n)) % 2).astype(np.int32)


# sea(0)/coast(1)/land(2): land never touches sea in the exemplar, so it may
# never touch it in any generation.
_TERRAIN = np.array([[0, 0, 1, 2, 2],
                     [0, 1, 1, 2, 2],
                     [1, 1, 2, 2, 2],
                     [0, 1, 1, 1, 2],
                     [0, 0, 1, 2, 2]], dtype=np.int32)


def test_exemplar_adjacency_consistency():
    adj, weights = adjacency_from_exemplar(_TERRAIN)
    assert adj.shape == (4, 3, 3) and weights.shape == (3,)
    assert np.isclose(weights.sum(), 1.0)
    # mirrored directions must transpose each other
    assert np.array_equal(adj[1], adj[0].T)
    assert np.array_equal(adj[3], adj[2].T)
    # land(2) next to sea(0) never observed
    for d in range(4):
        assert not adj[d][0, 2] and not adj[d][2, 0]


def test_checkerboard_collapses_exactly():
    adj, weights = adjacency_from_exemplar(_checkerboard())
    grid = wave_function_collapse(adj, weights, (8, 8),
                                  jax.random.PRNGKey(0))
    assert grid.shape == (8, 8)
    assert validate_tilemap(grid, adj)
    # the only valid 8x8 maps are the two checkerboard phases
    expect = _checkerboard(8)
    assert np.array_equal(grid, expect) or np.array_equal(grid, 1 - expect)


def test_terrain_respects_learned_constraints():
    adj, weights = adjacency_from_exemplar(_TERRAIN)
    grid = wave_function_collapse(adj, weights, (10, 10),
                                  jax.random.PRNGKey(1))
    assert validate_tilemap(grid, adj)
    # the transitive constraint: no land cell 4-adjacent to a sea cell
    land = grid == 2
    sea = grid == 0
    for shift_ax, s in [(0, 1), (0, -1), (1, 1), (1, -1)]:
        rolled = np.roll(sea, s, axis=shift_ax)
        if shift_ax == 0:
            rolled[0 if s == 1 else -1, :] = False
        else:
            rolled[:, 0 if s == 1 else -1] = False
        assert not (land & rolled).any()


def test_deterministic_under_key():
    adj, weights = adjacency_from_exemplar(_TERRAIN)
    k = jax.random.PRNGKey(7)
    a = wave_function_collapse(adj, weights, (6, 6), k)
    b = wave_function_collapse(adj, weights, (6, 6), k)
    assert np.array_equal(a, b)


def test_weights_bias_generation():
    # two mutually-compatible tiles (everything adjacent to everything);
    # tile 0 carries 9x the weight -> it must dominate the output.
    adj = np.ones((4, 2, 2), dtype=bool)
    weights = np.array([0.9, 0.1], dtype=np.float32)
    grids = sample_tilemaps(adj, weights, (8, 8), jax.random.PRNGKey(3), n=4)
    frac0 = (grids == 0).mean()
    assert frac0 > 0.7, frac0


def test_batched_generation_valid_and_distinct():
    adj, weights = adjacency_from_exemplar(_TERRAIN)
    grids = sample_tilemaps(adj, weights, (6, 6), jax.random.PRNGKey(4), n=3)
    assert grids.shape == (3, 6, 6)
    for g in grids:
        assert validate_tilemap(g, adj)
    assert not (np.array_equal(grids[0], grids[1])
                and np.array_equal(grids[1], grids[2]))


def test_wrap_mode_closes_the_torus():
    adj, weights = adjacency_from_exemplar(_checkerboard(), wrap=True)
    grid = wave_function_collapse(adj, weights, (6, 6),
                                  jax.random.PRNGKey(5), wrap=True)
    assert validate_tilemap(grid, adj, wrap=True)


def test_contradiction_raises():
    # tile 0 demands tile 1 on its right, but tile 1 allows NO right
    # neighbor: any grid wider than 1 is unsatisfiable from a 0-collapse,
    # and tile 1 alone can't tile a row either.
    adj = np.zeros((4, 2, 2), dtype=bool)
    adj[0, 0, 1] = True          # right of 0 must be 1
    adj[1] = adj[0].T
    adj[2] = np.eye(2, dtype=bool)  # vertical: same tile stacks
    adj[3] = adj[2].T
    weights = np.array([0.5, 0.5], dtype=np.float32)
    with pytest.raises(RuntimeError, match="contradiction"):
        wave_function_collapse(adj, weights, (4, 4), jax.random.PRNGKey(6),
                               max_restarts=2)


def test_exemplar_input_validation():
    with pytest.raises(ValueError, match="2-D"):
        adjacency_from_exemplar(np.zeros((2, 2, 2), dtype=np.int32))
    with pytest.raises(ValueError, match="integer"):
        adjacency_from_exemplar(np.zeros((2, 2), dtype=np.float32))
    with pytest.raises(ValueError, match="range"):
        adjacency_from_exemplar(_TERRAIN, n_tiles=2)


# --------------------------------------------------------------------------- #
# Growing-Grid learned tiles -> WFC (the full PCG chain of README.md:162)
# --------------------------------------------------------------------------- #

def _blocky_exemplar(gh=10, gw=10, t=4, seed=0):
    """An image genuinely made of K distinct 4x4 tiles laid out like
    terrain (so tile learning has an exact vocabulary to recover)."""
    rng = np.random.default_rng(seed)
    protos = np.stack([np.full((t, t, 3), v, np.float32)
                       for v in (0.1, 0.45, 0.8)])
    protos[1, :, : t // 2] += 0.2        # give tile 1 internal structure
    idx = np.minimum(np.abs(np.add.outer(np.arange(gh), np.arange(gw))
                            % 6 - 3), 2)
    img = protos[idx].transpose(0, 2, 1, 3, 4).reshape(gh * t, gw * t, 3)
    return img + rng.normal(0, 0.01, img.shape).astype(np.float32), idx


def test_growing_grid_grows_and_reduces_error():
    from deepcv_tpu.data.wfc import growing_grid
    rng = np.random.default_rng(0)
    centers = np.array([[0., 0.], [4., 0.], [0., 4.], [4., 4.], [2., 2.]])
    data = (centers[rng.integers(0, 5, 400)]
            + rng.normal(0, 0.15, (400, 2))).astype(np.float32)
    codebook, (r, c), hist = growing_grid(data, initial=(2, 2), max_units=6,
                                          steps_per_phase=25, seed=0)
    assert r * c >= 6 and codebook.shape == (r * c, 2)
    assert np.isfinite(codebook).all()
    assert hist[-1] < hist[0]            # growth + training reduced QE
    # every true center is represented by some unit within its spread
    d = np.linalg.norm(centers[:, None] - codebook[None], axis=-1)
    assert d.min(axis=1).max() < 0.5


def test_learn_tiles_recovers_vocabulary_and_renders_back():
    from deepcv_tpu.data.wfc import learn_tiles, render_tilemap
    img, true_idx = _blocky_exemplar()
    learned = learn_tiles(img, tile_size=4, max_tiles=6, seed=0)
    assert learned["codebook"].shape[1:] == (4, 4, 3)
    # rendering the learned tilemap reproduces the exemplar to noise level
    back = render_tilemap(learned["tilemap"], learned["codebook"])
    assert back.shape == img.shape
    assert np.abs(back - img).mean() < 0.05
    # distinct TRUE tiles never merge into one learned id (a true class MAY
    # split across two near-identical codebook units when max_tiles exceeds
    # the true vocabulary — rendering stays correct, checked above)
    tm = learned["tilemap"]
    majority = {}
    for v in np.unique(true_idx):
        ids, counts = np.unique(tm[true_idx == v], return_counts=True)
        assert counts.max() / counts.sum() > 0.8
        majority[v] = ids[np.argmax(counts)]
    assert len(set(majority.values())) == len(majority)
    with pytest.raises(ValueError, match="divisible"):
        learn_tiles(img[:-1], tile_size=4)


def test_generate_texture_end_to_end():
    from deepcv_tpu.data.wfc import (adjacency_from_exemplar,
                                     generate_texture, learn_tiles,
                                     validate_tilemap)
    img, _ = _blocky_exemplar(seed=3)
    out = generate_texture(img, (12, 14), jax.random.PRNGKey(5),
                           tile_size=4, max_tiles=6, seed=0)
    assert out.shape == (48, 56, 3)
    # the output is BUILT FROM the learned vocabulary and its tile layout
    # satisfies the exemplar-derived adjacency: re-quantize and validate
    learned = learn_tiles(img, tile_size=4, max_tiles=6, seed=0)
    cb = learned["codebook"].reshape(len(learned["codebook"]), -1)
    patches = (out.reshape(12, 4, 14, 4, 3).transpose(0, 2, 1, 3, 4)
               .reshape(12 * 14, -1))
    d2 = (np.sum(patches**2, 1)[:, None] + np.sum(cb**2, 1)[None]
          - 2 * patches @ cb.T)
    assert d2.min(axis=1).max() < 1e-3   # every output tile IS a codebook tile
    grid = np.argmin(d2, 1).reshape(12, 14)
    adj, _w = adjacency_from_exemplar(learned["tilemap"],
                                      n_tiles=len(cb))
    assert validate_tilemap(grid, adj)
