"""Mesh/sharding helpers — the framework's parallelism toolbox.

Reference parallelism inventory (SURVEY §2.9): data parallel (DataParallel/
DDP), sync batch norm, and logical HRNet branches; no TP/PP/SP/EP. The
TPU-native mapping (train/backend.py) covers DP + sync-BN through GSPMD.
This module adds the pieces a *framework* should expose beyond parity:

  * :func:`make_mesh` — build an N-d device mesh by axis sizes;
  * :func:`tensor_parallel_rules` / :func:`shard_params` — simple
    Megatron-style tensor parallelism for Dense/Conv kernels over a 'model'
    axis (column-parallel on the output-features dim): XLA inserts the
    matching collectives, so annotating params is ALL that is needed;
  * :func:`cross_replica_mean` — explicit-collective helper for
    shard_map-style code;
  * :func:`spatial_sharding` — spatial partitioning (SP) for large images:
    shard activations on H over the mesh; XLA inserts the conv halo
    exchanges automatically (no manual ghost-cell code);
  * :func:`pipeline_parallel_apply` — GPipe-style pipeline parallelism
    (PP) over a 'stage' mesh axis: microbatched schedule written with
    ``jax.shard_map`` + ``lax.ppermute`` so stage-to-stage transfers ride
    ICI point-to-point links;
  * :func:`ring_attention` — exact sequence-parallel attention: K/V
    shards rotate around the mesh axis via ``lax.ppermute`` while each
    device folds them into online-softmax statistics (the flash kernel's
    merge, lifted from VMEM blocks to mesh shards);
  * :func:`data_parallelism_usefulness_heuristic` — reference
    ``is_data_parallelization_usefull_heuristic`` parity (nn.py:618-637):
    sigmoid score over model capacity / batch size / device count, used to
    advise whether multi-chip DP is worth it for tiny models.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "tensor_parallel_rules", "shard_params",
           "cross_replica_mean", "spatial_sharding", "pipeline_parallel_apply",
           "ring_attention", "expert_parallel_rules",
           "data_parallelism_usefulness_heuristic"]


def __getattr__(name):
    # EP rules live with the MoE block (ops/moe.py) but belong to this
    # toolbox's namespace; lazy re-export avoids an import cycle.
    if name == "expert_parallel_rules":
        from deepcv_tpu.ops.moe import expert_parallel_rules
        return expert_parallel_rules
    raise AttributeError(name)


def make_mesh(axis_sizes: Mapping[str, int],
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh from {axis_name: size}; sizes must multiply to the device count."""
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(int(s) for s in axis_sizes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"axis sizes {dict(axis_sizes)} do not multiply to "
                         f"{len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axis_sizes))


def tensor_parallel_rules(params, mesh: Mesh, model_axis: str = "model",
                          min_features: int = 2) -> Any:
    """PartitionSpec pytree: shard the OUTPUT-features dim of every kernel
    over ``model_axis`` when divisible (column-parallel linear/conv); biases
    and everything else replicated.

    With params so sharded and activations unsharded on features, XLA
    all-gathers outputs exactly where needed — Megatron behavior without any
    manual collective.
    """
    axis_size = mesh.shape[model_axis]

    def rule(path, leaf):
        last = str(getattr(path[-1], "key", path[-1])) if path else ""
        if last == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[-1] % axis_size == 0 \
                and leaf.shape[-1] // axis_size >= min_features:
            return P(*([None] * (leaf.ndim - 1)), model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, rules=None, model_axis: str = "model"):
    """Place a param pytree onto the mesh per the TP rules (or replicated)."""
    if rules is None:
        rules = tensor_parallel_rules(params, mesh, model_axis)
    return jax.tree_util.tree_map(
        lambda w, spec: jax.device_put(w, NamedSharding(mesh, spec)),
        params, rules)


def cross_replica_mean(tree, axis_name: str = "data"):
    """pmean over a named axis — for shard_map/pmap-style code (the explicit
    SyncBatchNorm collective, reference ignite_training.py:382-386)."""
    return jax.tree_util.tree_map(lambda v: jax.lax.pmean(v, axis_name), tree)


def spatial_sharding(mesh: Mesh, axis_name: str = "data",
                     spatial_dim: int = 1) -> NamedSharding:
    """Spatial partitioning: a NamedSharding that splits NHWC activations on
    the height dim over ``axis_name``.

    For images too large for one chip's HBM (the regime the reference never
    reaches — its DataParallel splits batch only), put the INPUT on this
    sharding and jit the model as usual: GSPMD propagates the spatial split
    through every conv and inserts halo exchanges at kernel boundaries
    automatically. Works for any batch size, including batch 1.
    """
    spec = [None, None, None, None]
    spec[spatial_dim] = axis_name
    return NamedSharding(mesh, P(*spec))


def pipeline_parallel_apply(stage_fn: Callable, stage_params, x,
                            *, mesh: Mesh, n_microbatches: int,
                            stage_axis: str = "stage"):
    """GPipe-style pipeline-parallel forward over ``mesh[stage_axis]``.

    ``stage_params``: pytree whose leaves are stacked per-stage, leading dim
    = number of stages S (stage i's slice lives on stage-i devices only —
    the point of PP: each chip holds 1/S of the params). ``stage_fn(params_i,
    h) -> h`` must preserve the activation shape (the classic uniform-stage
    constraint). ``x``: (batch, ...) with batch divisible by
    ``n_microbatches``.

    Schedule: S + M - 1 steps; at step t stage s processes microbatch
    t - s; activations hop stage->stage+1 via ``lax.ppermute`` (neighbor
    ICI transfers, no all-to-all). Bubble fraction = (S-1)/(S+M-1) — pick
    M >= 4*S. Written with shard_map so the collective schedule is explicit
    rather than left to GSPMD sharding propagation (pipelining is the one
    pattern GSPMD cannot derive from shardings alone).
    """
    S = mesh.shape[stage_axis]
    M = int(n_microbatches)
    n = x.shape[0]
    if n % M:
        raise ValueError(f"batch {n} not divisible by n_microbatches {M}")
    leaves = jax.tree_util.tree_leaves(stage_params)
    if leaves and leaves[0].shape[0] != S:
        raise ValueError(f"stage_params leading dim {leaves[0].shape[0]} != "
                         f"number of stages {S}")
    xm = x.reshape(M, n // M, *x.shape[1:])

    fwd = [(s, s + 1) for s in range(S - 1)]          # stage s -> s+1

    def local(params, xm):
        params = jax.tree_util.tree_map(lambda p: p[0], params)  # my slice
        stage = jax.lax.axis_index(stage_axis)
        mb = xm.shape[1]
        h0 = jnp.zeros_like(xm[0])

        def body(carry, t):
            h, outs = carry
            # stage 0 ingests microbatch t (while t < M), others their input
            src = jnp.where(t < M, jnp.clip(t, 0, M - 1), 0)
            h = jnp.where(stage == 0, jax.lax.dynamic_index_in_dim(
                xm, src, axis=0, keepdims=False), h)
            y = stage_fn(params, h)
            # last stage finishes microbatch t-(S-1) at step t
            w = jnp.maximum(t - (S - 1), 0)
            cur = jax.lax.dynamic_index_in_dim(outs, w, axis=0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(t >= S - 1, y, cur), w, axis=0)
            # hop activations one stage forward (point-to-point ICI)
            h_next = jax.lax.ppermute(y, stage_axis, fwd)
            return (h_next, outs), None

        outs0 = jnp.zeros((M, *jax.eval_shape(stage_fn, params, h0).shape),
                          h0.dtype)
        (_, outs), _ = jax.lax.scan(body, (h0, outs0), jnp.arange(S + M - 1))
        # only the last stage holds real outputs; broadcast to every stage
        outs = jax.lax.psum(jnp.where(stage == S - 1, outs, 0.0), stage_axis)
        return outs

    in_specs = (jax.tree_util.tree_map(lambda _: P(stage_axis), stage_params),
                P())
    out = jax.shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P(),
                        check_vma=False)(stage_params, xm)
    return out.reshape(n, *out.shape[2:])


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   *, mesh: Mesh, axis_name: str = "data") -> jnp.ndarray:
    """Ring attention (Liu et al., arXiv:2310.01889): sequence-parallel
    exact attention over ``mesh[axis_name]``.

    (N, H, T, Dh) -> (N, H, T, Dh), with the SEQUENCE dim sharded over the
    mesh axis — each of the P devices holds a (N, H, T/P, Dh) shard of
    q/k/v and only ever materializes a (T/P, T/P) score block, so the
    attainable T scales linearly with the ring size on top of what one
    chip's flash kernel can hold. P ring steps: each device accumulates
    online-softmax statistics (running max m, normalizer l, weighted sum
    acc — the same exact rescaling as ``flash_attention``'s inner loop,
    lifted from VMEM blocks to mesh shards) against its resident K/V
    block, then rotates K/V one hop via ``lax.ppermute`` — neighbor ICI
    transfers that overlap with the next block's compute under XLA's
    latency-hiding scheduler, never an all-gather of the full sequence.

    Numerically exact softmax attention (f32 statistics regardless of io
    dtype), differentiable through the scan-of-ppermute (ppermute's
    transpose is the reverse permutation, so the backward is a ring too).
    Composes with DP/TP on the other mesh axes: N and H ride any batch
    sharding GSPMD already applies. The reference has no sequence story at
    all (SURVEY §5.7); this is the long-context member of the toolbox.
    """
    if q.ndim != 4:
        raise ValueError(f"expected (N, H, T, Dh) inputs, got {q.shape}")
    P_ = mesh.shape[axis_name]
    t = q.shape[2]
    if t % P_:
        raise ValueError(f"sequence length {t} not divisible by ring size "
                         f"{P_} (mesh axis {axis_name!r})")
    scale = 1.0 / math.sqrt(q.shape[-1])
    fwd = [(r, (r + 1) % P_) for r in range(P_)]      # rotate shards

    def local(q, k, v):                                # (N, H, T/P, Dh)
        qf = q.astype(jnp.float32) * scale

        def accumulate(stats, kc, vc):
            m, l, acc = stats
            s = jnp.einsum("nhqd,nhkd->nhqk", qf, kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.einsum(
                "nhqk,nhkd->nhqd", p, vc.astype(jnp.float32))
            return m_new, l, acc

        def step(carry, _):
            stats, kc, vc = carry
            # rotate FIRST: the resident shard was folded in before the
            # scan, so exactly P-1 hops move each K/V shard around the ring
            # (a trailing P-th rotation would be dead ICI traffic XLA
            # cannot eliminate from the fixed-trip scan body)
            kc = jax.lax.ppermute(kc, axis_name, fwd)
            vc = jax.lax.ppermute(vc, axis_name, fwd)
            return (accumulate(stats, kc, vc), kc, vc), None

        stat = (*qf.shape[:3], 1)
        init = (jnp.full(stat, -jnp.inf, jnp.float32),
                jnp.zeros(stat, jnp.float32),
                jnp.zeros(qf.shape, jnp.float32))
        stats0 = accumulate(init, k, v)                # resident block
        ((m, l, acc), _, _), _ = jax.lax.scan(step, (stats0, k, v), None,
                                              length=P_ - 1)
        return (acc / l).astype(q.dtype)

    spec = P(None, None, axis_name, None)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


def data_parallelism_usefulness_heuristic(model_capacity: int, batch_size: int,
                                          n_devices: Optional[int] = None) -> float:
    """Score in [0, 1]: is splitting this workload over more chips useful?

    Reference ``is_data_parallelization_usefull_heuristic`` (nn.py:608-637)
    scored DataParallel worthiness by capacity/batch/ngpus sigmoids; same
    shape here with TPU-scaled constants (per-chip batch below ~64 or models
    under ~1M params leave chips idle).
    """
    n_devices = n_devices if n_devices is not None else len(jax.devices())
    if n_devices <= 1:
        return 0.0

    def sig(x):
        return 1.0 / (1.0 + math.exp(-x))

    capacity_score = sig((math.log10(max(model_capacity, 1)) - 6.0) * 2.0)
    per_chip = batch_size / n_devices
    batch_score = sig((per_chip - 64.0) / 32.0)
    return float(0.5 * capacity_score + 0.5 * batch_score)
