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
