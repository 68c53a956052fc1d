"""Wave Function Collapse — TPU-native procedural content generation.

The reference lists this as a pure TODO (`/root/reference/README.md:162`:
"add a simple open-source implementation of wave function collapsing,
optimize it -> Future work: Procedural Content Generation"). This is the
simple-tiled WFC model (Gumin's formulation), built for the TPU:

  * **Propagation is matmul work, not pointer chasing.** The classic
    implementation walks a worklist of (cell, tile) removals; on an
    accelerator that serializes. Here one propagation sweep computes, for
    every cell and direction at once, ``support[d] = shift_d(wave) @ A[d]^T``
    — a batched ``(4, H*W, T) x (4, T, T)`` einsum over the tile axis, i.e.
    MXU-shaped — and intersects the four supports. Sweeps repeat to fixpoint
    inside a ``lax.while_loop``.
  * **One compiled program per generation.** The outer observe/collapse loop
    (min-entropy cell selection, weighted tile draw, propagation) is a
    single jitted ``while_loop`` — zero host round-trips per observation.
  * **Batched generation.** ``sample_tilemaps`` vmaps whole generations over
    a key batch; contradicted lanes are retried with fresh keys host-side.

Adjacency can be written by hand or learned from an exemplar tilemap
(``adjacency_from_exemplar``), matching WFC's "learn constraints from a
sample" usage.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["adjacency_from_exemplar", "wave_function_collapse",
           "sample_tilemaps", "validate_tilemap", "growing_grid",
           "learn_tiles", "render_tilemap", "generate_texture"]

_logger = logging.getLogger(__name__)

# Direction order everywhere in this module: 0=right (+col), 1=left,
# 2=down (+row), 3=up. A[d][s, t] == True iff tile ``t`` may be the
# d-direction neighbor of tile ``s``; consistency forces A[1] == A[0].T
# and A[3] == A[2].T.
_OPPOSITE = (1, 0, 3, 2)


def adjacency_from_exemplar(exemplar: np.ndarray, n_tiles: Optional[int] = None,
                            wrap: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (adjacency, weights) from an exemplar tile-index map.

    ``adjacency[4, T, T]`` marks every neighbor pair observed in the
    exemplar (plus the mirrored direction, so it is consistent by
    construction); ``weights[T]`` are tile frequencies (sum to 1).
    ``wrap=True`` also counts pairs across the exemplar's borders
    (toroidal exemplar).
    """
    ex = np.asarray(exemplar)
    if ex.ndim != 2:
        raise ValueError(f"exemplar must be 2-D tile indices, got {ex.shape}")
    if not np.issubdtype(ex.dtype, np.integer):
        raise ValueError("exemplar must hold integer tile indices")
    t_count = int(ex.max()) + 1 if n_tiles is None else int(n_tiles)
    if ex.min() < 0 or int(ex.max()) >= t_count:
        raise ValueError("exemplar indices out of [0, n_tiles) range")
    adj = np.zeros((4, t_count, t_count), dtype=bool)

    def _count(src: np.ndarray, dst: np.ndarray, d: int) -> None:
        adj[d][src.ravel(), dst.ravel()] = True
        adj[_OPPOSITE[d]][dst.ravel(), src.ravel()] = True

    if wrap:
        _count(ex, np.roll(ex, -1, axis=1), 0)          # right neighbor
        _count(ex, np.roll(ex, -1, axis=0), 2)          # down neighbor
    else:
        _count(ex[:, :-1], ex[:, 1:], 0)
        _count(ex[:-1, :], ex[1:, :], 2)
    weights = np.bincount(ex.ravel(), minlength=t_count).astype(np.float64)
    return adj, (weights / weights.sum()).astype(np.float32)


def _shifted_waves(wave: jnp.ndarray, wrap: bool) -> jnp.ndarray:
    """Stack the 4 neighbor views of ``wave[H, W, T]`` -> ``[4, H, W, T]``.

    Out-of-grid neighbors impose no constraint, so (non-wrap) borders pad
    with all-True rows/columns.
    """
    if wrap:
        return jnp.stack([jnp.roll(wave, -1, axis=1), jnp.roll(wave, 1, axis=1),
                          jnp.roll(wave, -1, axis=0), jnp.roll(wave, 1, axis=0)])
    h, w, t = wave.shape
    col = jnp.ones((h, 1, t), dtype=wave.dtype)
    row = jnp.ones((1, w, t), dtype=wave.dtype)
    return jnp.stack([
        jnp.concatenate([wave[:, 1:], col], axis=1),    # right neighbor
        jnp.concatenate([col, wave[:, :-1]], axis=1),   # left neighbor
        jnp.concatenate([wave[1:], row], axis=0),       # down neighbor
        jnp.concatenate([row, wave[:-1]], axis=0),      # up neighbor
    ])


def _propagate(wave: jnp.ndarray, adj_f32: jnp.ndarray, wrap: bool) -> jnp.ndarray:
    """Constraint-propagate ``wave`` to fixpoint (arc consistency).

    Tile ``t`` survives at cell ``c`` iff for every in-grid direction ``d``
    some tile ``u`` with ``A[d][t, u]`` is still possible at the d-neighbor:
    ``support[d] = shift_d(wave) @ A[d]^T > 0`` — one batched einsum for the
    whole grid, all directions at once.
    """
    def sweep(w):
        neigh = _shifted_waves(w, wrap).astype(jnp.float32)
        support = jnp.einsum("dhwu,dtu->dhwt", neigh, adj_f32) > 0.0
        return w & support.all(axis=0)

    def body(state):
        w, _ = state
        new = sweep(w)
        return new, jnp.any(new != w)

    wave, _ = jax.lax.while_loop(lambda s: s[1], body,
                                 (sweep(wave), jnp.asarray(True)))
    return wave


@partial(jax.jit, static_argnames=("height", "width", "wrap"))
def _collapse_program(adj: jnp.ndarray, weights: jnp.ndarray,
                      key: jax.Array, height: int, width: int,
                      wrap: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full WFC generation: returns (grid[H, W] int32, ok bool)."""
    t_count = weights.shape[0]
    adj_f32 = adj.astype(jnp.float32)
    log_w = jnp.log(jnp.clip(weights, 1e-30))
    wave0 = _propagate(jnp.ones((height, width, t_count), dtype=bool),
                       adj_f32, wrap)

    def unresolved(state):
        counts = state[0].sum(axis=-1)
        return jnp.any(counts > 1) & jnp.all(counts > 0)

    def observe(state):
        wave, k = state
        k, k_tie, k_draw = jax.random.split(k, 3)
        flat = wave.reshape(-1, t_count)
        counts = flat.sum(axis=-1)
        w_allowed = weights * flat
        wsum = w_allowed.sum(axis=-1)
        # Shannon entropy of the allowed-tile distribution, +inf on
        # resolved/contradicted cells; tiny uniform noise breaks ties the
        # way the classic implementation does.
        plogp = jnp.where(flat, w_allowed * log_w, 0.0).sum(axis=-1)
        entropy = jnp.log(jnp.clip(wsum, 1e-30)) - plogp / jnp.clip(wsum, 1e-30)
        entropy = entropy + jax.random.uniform(k_tie, entropy.shape) * 1e-6
        entropy = jnp.where(counts > 1, entropy, jnp.inf)
        cell = jnp.argmin(entropy)
        logits = jnp.where(flat[cell], log_w, -jnp.inf)
        tile = jax.random.categorical(k_draw, logits)
        flat = flat.at[cell].set(jax.nn.one_hot(tile, t_count, dtype=bool))
        wave = _propagate(flat.reshape(height, width, t_count), adj_f32, wrap)
        return wave, k

    wave, _ = jax.lax.while_loop(unresolved, observe, (wave0, key))
    ok = jnp.all(wave.sum(axis=-1) == 1)
    return jnp.argmax(wave, axis=-1).astype(jnp.int32), ok


def wave_function_collapse(adjacency: np.ndarray, weights: np.ndarray,
                           shape: Tuple[int, int], key: jax.Array,
                           wrap: bool = False,
                           max_restarts: int = 8) -> np.ndarray:
    """Generate one ``shape``-sized tilemap satisfying ``adjacency``.

    Restarts with a fresh key on contradiction (WFC's standard recovery) up
    to ``max_restarts`` times, then raises ``RuntimeError``.
    """
    adj = jnp.asarray(np.asarray(adjacency, dtype=bool))
    w = jnp.asarray(np.asarray(weights, dtype=np.float32))
    if adj.shape != (4, w.shape[0], w.shape[0]):
        raise ValueError(f"adjacency must be (4, T, T) with T={w.shape[0]}, "
                         f"got {adj.shape}")
    for attempt in range(max_restarts + 1):
        key, sub = jax.random.split(key)
        grid, ok = _collapse_program(adj, w, sub, int(shape[0]),
                                     int(shape[1]), bool(wrap))
        if bool(ok):
            return np.asarray(grid)
        _logger.info("wfc: contradiction, restart %d/%d", attempt + 1,
                     max_restarts)
    raise RuntimeError(f"wave_function_collapse: contradiction after "
                       f"{max_restarts + 1} attempts — adjacency likely "
                       f"over-constrained for shape {tuple(shape)}")


def sample_tilemaps(adjacency: np.ndarray, weights: np.ndarray,
                    shape: Tuple[int, int], key: jax.Array, n: int,
                    wrap: bool = False, max_restarts: int = 8) -> np.ndarray:
    """Generate ``n`` tilemaps in parallel (vmapped whole generations).

    All ``n`` generations run as one device program; lanes that hit a
    contradiction are re-drawn with fresh keys (only the failed lanes).
    """
    adj = jnp.asarray(np.asarray(adjacency, dtype=bool))
    w = jnp.asarray(np.asarray(weights, dtype=np.float32))
    batched = jax.jit(jax.vmap(
        lambda k: _collapse_program(adj, w, k, int(shape[0]), int(shape[1]),
                                    bool(wrap))))
    key, sub = jax.random.split(key)
    grids, ok = batched(jax.random.split(sub, n))
    grids, ok = np.asarray(grids), np.asarray(ok)
    for _ in range(max_restarts):
        if ok.all():
            break
        key, sub = jax.random.split(key)
        retry_g, retry_ok = batched(jax.random.split(sub, n))
        bad = ~ok
        grids[bad] = np.asarray(retry_g)[bad]
        ok[bad] = np.asarray(retry_ok)[bad]
    if not ok.all():
        raise RuntimeError(f"sample_tilemaps: {int((~ok).sum())}/{n} lanes "
                           f"still contradicted after {max_restarts} retries")
    return grids


def validate_tilemap(grid: np.ndarray, adjacency: np.ndarray,
                     wrap: bool = False) -> bool:
    """True iff every neighbor pair in ``grid`` is allowed by ``adjacency``
    (plain-numpy oracle, used by tests and callers as a post-check)."""
    g = np.asarray(grid)
    adj = np.asarray(adjacency, dtype=bool)
    if wrap:
        pairs = [(g, np.roll(g, -1, axis=1), 0), (g, np.roll(g, -1, axis=0), 2)]
    else:
        pairs = [(g[:, :-1], g[:, 1:], 0), (g[:-1, :], g[1:, :], 2)]
    return all(adj[d][a.ravel(), b.ravel()].all() for a, b, d in pairs)


# --------------------------------------------------------------------------- #
# Growing Grid tile learning (the reference's full PCG sentence)
# --------------------------------------------------------------------------- #
#
# The reference's future-work sentence couples three pieces: "Use a GAN to
# generate slots ... used by Wave Function Collapse (+ Growing Grids as
# space filling algorithm to determine tile shapes)" (README.md:162). The
# slot/tile-learning role is filled here by a GROWING GRID self-organizing
# map (Fritzke 1995): a small SOM whose lattice inserts rows/columns where
# quantization error concentrates, so the tile vocabulary SIZES ITSELF to
# the exemplar's complexity. TPU shape: each training phase is full-batch
# — distances are one (N, D) x (D, K) matmul, the batch-SOM update is two
# more ((K, N) x (N, D)), and the per-unit error accumulation is a one-hot
# matmul — all MXU work under one jit per lattice size (the lattice grows
# a handful of times, so a handful of compiles).

def growing_grid(data: np.ndarray, *, initial: Tuple[int, int] = (2, 2),
                 max_units: int = 16, steps_per_phase: int = 30,
                 lr: float = 0.5, sigma: float = 1.2, seed: int = 0,
                 finetune_sigmas: Tuple[float, ...] = (0.5, 0.2, 0.05),
                 ) -> Tuple[np.ndarray, Tuple[int, int], list]:
    """Fit a growing-grid SOM to (N, D) data.

    Returns (codebook (K, D) row-major over the final lattice, lattice
    shape (R, C), per-phase mean quantization-error history). Growth
    phase: constant ``sigma`` (Fritzke's scheme), one row or column
    inserted after each phase between the highest-error unit and its
    highest-error lattice neighbor (weights = mean of the flanking line),
    until ``R*C >= max_units``. Fine-tune phase: ``finetune_sigmas``
    shrink the neighborhood so units specialize (sigma -> 0 turns the
    batch-SOM update into k-means on the grown lattice).
    """
    x = jnp.asarray(np.asarray(data, np.float32))
    n, d = x.shape
    rng = np.random.default_rng(seed)
    r, c = initial
    w = (np.asarray(x.mean(0))[None, :]
         + 0.01 * rng.standard_normal((r * c, d))).astype(np.float32)
    history: list = []

    def _phase(w0, coords, sig):
        """steps_per_phase full-batch SOM updates; returns (w, unit errors,
        mean qe)."""
        coords = jnp.asarray(coords, jnp.float32)          # (K, 2)

        def step(wk, i):
            d2 = (jnp.sum(x * x, 1)[:, None] + jnp.sum(wk * wk, 1)[None]
                  - 2.0 * x @ wk.T)                        # (N, K) MXU
            bmu = jnp.argmin(d2, axis=1)
            gd2 = jnp.sum((coords[bmu][:, None, :]
                           - coords[None, :, :]) ** 2, -1)  # (N, K)
            h = jnp.exp(-gd2 / (2.0 * sig * sig))
            num = h.T @ x                                   # (K, D) MXU
            den = jnp.maximum(h.sum(0), 1e-12)[:, None]
            # empty-neighborhood units (den ~ 0) keep their weights
            upd = jnp.where(h.sum(0)[:, None] > 1e-8, num / den, wk)
            wk = (1.0 - lr) * wk + lr * upd
            one = jax.nn.one_hot(bmu, wk.shape[0], dtype=jnp.float32)
            unit_err = one.T @ jnp.min(d2, axis=1)          # (K,)
            return wk, (unit_err, jnp.mean(jnp.min(d2, axis=1)))

        wk, (errs, qes) = jax.lax.scan(step, w0, jnp.arange(steps_per_phase))
        return wk, errs[-1], qes[-1]

    phase = jax.jit(_phase)

    def _coords(r, c):
        return np.stack(np.meshgrid(np.arange(r), np.arange(c),
                                    indexing="ij"), -1).reshape(-1, 2)

    while True:
        w_j, errs, qe = phase(jnp.asarray(w), _coords(r, c),
                              jnp.float32(sigma))
        w = np.asarray(w_j)
        history.append(float(qe))
        if r * c >= max_units:
            break
        # grow: between the worst unit and its worst lattice neighbor
        errs = np.asarray(errs)
        e = int(np.argmax(errs))
        er, ec = divmod(e, c)
        nbrs = [(er + dr, ec + dc) for dr, dc in
                ((0, 1), (0, -1), (1, 0), (-1, 0))
                if 0 <= er + dr < r and 0 <= ec + dc < c]
        fr, fc = max(nbrs, key=lambda rc: errs[rc[0] * c + rc[1]])
        grid_w = w.reshape(r, c, d)
        if fr == er:                                        # insert a column
            lo = min(ec, fc)
            new_col = 0.5 * (grid_w[:, lo] + grid_w[:, lo + 1])
            grid_w = np.concatenate([grid_w[:, :lo + 1], new_col[:, None],
                                     grid_w[:, lo + 1:]], axis=1)
            c += 1
        else:                                               # insert a row
            lo = min(er, fr)
            new_row = 0.5 * (grid_w[lo] + grid_w[lo + 1])
            grid_w = np.concatenate([grid_w[:lo + 1], new_row[None],
                                     grid_w[lo + 1:]], axis=0)
            r += 1
        w = grid_w.reshape(r * c, d)

    for sig in finetune_sigmas:                             # specialize
        w_j, _, qe = phase(jnp.asarray(w), _coords(r, c), jnp.float32(sig))
        w = np.asarray(w_j)
        history.append(float(qe))
    return w, (r, c), history


def learn_tiles(image: np.ndarray, tile_size: int = 4,
                max_tiles: int = 12, seed: int = 0, **gg_kw):
    """Learn a tile vocabulary from one exemplar image and quantize it.

    Non-overlapping ``tile_size`` patches -> growing-grid codebook (the
    'determine tile shapes' role) -> BMU tilemap. Returns a dict with
    ``codebook`` (K, tile, tile, C), ``tilemap`` (H//t, W//t) int32,
    ``grid_shape``, ``qe_history``.
    """
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    t = int(tile_size)
    if h % t or w % t:
        raise ValueError(f"image {h}x{w} not divisible by tile_size {t}")
    gh, gw = h // t, w // t
    patches = (img.reshape(gh, t, gw, t, ch).transpose(0, 2, 1, 3, 4)
               .reshape(gh * gw, t * t * ch))
    codebook, grid_shape, hist = growing_grid(
        patches, max_units=max_tiles, seed=seed, **gg_kw)
    d2 = (np.sum(patches ** 2, 1)[:, None]
          + np.sum(codebook ** 2, 1)[None] - 2.0 * patches @ codebook.T)
    tilemap = np.argmin(d2, 1).astype(np.int32).reshape(gh, gw)
    return {"codebook": codebook.reshape(-1, t, t, ch),
            "tilemap": tilemap, "grid_shape": grid_shape,
            "qe_history": hist}


def render_tilemap(tilemap: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(gh, gw) tile indices + (K, t, t, C) codebook -> (gh*t, gw*t, C)."""
    tiles = np.asarray(codebook)[np.asarray(tilemap)]       # (gh, gw, t, t, C)
    gh, gw, t, _, ch = tiles.shape
    return tiles.transpose(0, 2, 1, 3, 4).reshape(gh * t, gw * t, ch)


def generate_texture(image: np.ndarray, out_tiles: Tuple[int, int],
                     key: jax.Array, tile_size: int = 4, max_tiles: int = 12,
                     seed: int = 0, wrap: bool = False,
                     max_restarts: int = 8) -> np.ndarray:
    """The full PCG chain of the reference's future-work sentence: exemplar
    image -> growing-grid learned tiles -> exemplar-derived adjacency ->
    WFC generation -> rendered texture of ``out_tiles`` (rows, cols) tiles.
    """
    learned = learn_tiles(image, tile_size=tile_size, max_tiles=max_tiles,
                          seed=seed)
    adj, weights = adjacency_from_exemplar(
        learned["tilemap"], n_tiles=len(learned["codebook"]))
    grid = wave_function_collapse(adj, weights, out_tiles, key, wrap=wrap,
                                  max_restarts=max_restarts)
    return render_tilemap(grid, learned["codebook"])
