"""Attention ops and vision-transformer building blocks.

Beyond-reference capability: the reference DeepCV is CNN-only (SURVEY.md
§5.7 — "no attention layer anywhere in repo"); a production CV framework
today needs the ViT family, so this module adds the attention stack the
TPU way:

* patch embedding is a **reshape + one Dense matmul** (pure MXU work), not
  a stride-p convolution — mathematically identical to torchvision's
  ``conv_proj`` (a k=p, s=p conv touches each pixel exactly once) but it
  avoids the conv path's 3->8 lane padding and maps straight onto the MXU;
* attention itself has two interchangeable implementations:
  ``attention_xla`` (einsum + softmax, XLA fuses it well at short
  sequence) and :func:`flash_attention` — a Pallas online-softmax kernel
  that never materializes the (T, T) score matrix in HBM (VMEM-blocked,
  f32 accumulation), the standard memory-bound win at long sequence;
* everything is shape-static and jit-safe; the transformer blocks run
  under the same ``train=`` convention as the rest of ``ops/nn.py``.

Numerics follow torch exactly where torch has an opinion (verified by the
executing-torch mirror in tests/test_torch_parity.py): packed qkv
projection ordering = ``nn.MultiheadAttention.in_proj_weight`` rows,
pre-LN encoder block wiring = torchvision ``EncoderBlock``, MLP uses
**exact** (erf) GELU — ``jax.nn.gelu`` defaults to the tanh approximation,
which diverges from ``torch.nn.GELU`` by ~1e-3.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepcv_tpu.ops.nn import xavier_uniform_with_gain

__all__ = [
    "attention_xla", "flash_attention", "scaled_dot_product_attention",
    "MultiHeadSelfAttention", "MlpBlock", "TransformerEncoderBlock",
    "PatchEmbed", "TakeToken", "resize_pos_embedding",
    "WindowAttention", "SwinBlock", "PatchMerging",
]

#: exact (erf) GELU — torch.nn.GELU parity; jax.nn.gelu defaults to tanh approx
gelu_exact = functools.partial(jax.nn.gelu, approximate=False)


# --------------------------------------------------------------------------- #
# Attention implementations
# --------------------------------------------------------------------------- #

def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                  ) -> jnp.ndarray:
    """Reference scaled-dot-product attention, (N, H, T, Dh) -> same.

    Plain einsum + softmax: XLA keeps the (T, T) scores in HBM, which is
    optimal for short sequences (ViT-B/16 @224 has T=197) and the honest
    baseline the Pallas kernel is measured against. Softmax statistics in
    f32 even under bf16 inputs.
    """
    dh = q.shape[-1]
    s = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nhkd->nhqd", p.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *maybe_lse_ref,
                  scale: float, t_actual: int, block_k: int):
    """One (batch*head, q-block) program: online-softmax over K/V blocks.

    K/V live whole in VMEM for this program (T_pad x Dh — ~0.5 MB at
    T=4k, Dh=64 bf16); scores exist only as a (BLOCK_Q, BLOCK_K) f32 tile,
    never in HBM. Accumulation is f32 regardless of io dtype. When an
    ``lse_ref`` output is present (training forward), the per-row
    logsumexp of the scaled scores is written out for the Pallas backward.
    """
    q = q_ref[0].astype(jnp.float32) * scale            # (BQ, Dh)
    bq = q.shape[0]
    dh = q.shape[1]
    t_pad = k_ref.shape[1]
    n_blocks = t_pad // block_k

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, BK)
        # mask zero-padded kv rows (t_actual is static) with a large FINITE
        # negative: with -inf, a fully-padded k-block would leave m at -inf
        # and alpha = exp(-inf - -inf) = NaN (possible when block_q >
        # block_k forces padding past a k-block boundary)
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(col < t_actual, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, vb,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if maybe_lse_ref:
        # stored (BQ, 8): Mosaic tiling needs the trailing block dims to be
        # (8k, 128k) or array-equal, so the scalar rides 8 lanes (lane 0 read
        # back in the backward kernels)
        lse_ref, = maybe_lse_ref
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))


def _flash_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 128, block_k: int = 128,
                    return_lse: bool = False):
    """(N, H, T, Dh) flash forward via pallas_call; pads T to the block.

    ``return_lse=True`` (training) additionally returns the (N, H, T) f32
    per-row logsumexp of the scaled scores — the statistic the Pallas
    backward needs to rebuild softmax tiles without a second online pass.
    """
    n, h, t, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    b = n * h
    # pad to a common multiple so BOTH the q-grid and the k-loop divide T
    lcm = math.lcm(block_q, block_k)
    t_pad = lcm * -(-t // lcm)

    def flat_pad(x):
        x = x.reshape(b, t, dh)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0))) \
            if t_pad != t else x

    qf, kf, vf = flat_pad(q), flat_pad(k), flat_pad(v)
    kernel = functools.partial(_flash_kernel, scale=scale, t_actual=t,
                               block_k=block_k)
    grid = (b, t_pad // block_q)
    # compiled Mosaic path on TPU; interpreter on the CPU test backend
    interpret = jax.default_backend() == "cpu"
    out_specs = pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, t_pad, dh), q.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, block_q, 8), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, t_pad, 8), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * t * dh,
            bytes_accessed=3 * b * t * dh * q.dtype.itemsize
            + b * t * dh * q.dtype.itemsize,
            transcendentals=b * t * t),
        interpret=interpret,
    )(qf, kf, vf)
    if return_lse:
        out, lse = out
        return (out[:, :t, :].reshape(n, h, t, dh),
                lse[:, :t, 0].reshape(n, h, t))
    return out[:, :t, :].reshape(n, h, t, dh)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, scale: float, t_actual: int,
                         block_k: int):
    """One (batch*head, q-block) program of the flash backward: dQ.

    Rebuilds each (BQ, BK) softmax tile from the saved logsumexp —
    p = exp(q·kᵀ·scale − lse) — so the (T, T) matrix never exists in HBM
    in the backward either (the r3 upgrade over the XLA-remat backward).
    dq_row_i depends only on row i, so the q-grid is embarrassingly
    parallel like the forward.
    """
    qb = q_ref[0].astype(jnp.float32)                   # (BQ, Dh)
    dob = do_ref[0].astype(jnp.float32)                 # (BQ, Dh)
    lse = lse_ref[0][:, :1]                             # (BQ, 1) f32
    delt = delta_ref[0][:, :1]                          # (BQ, 1) f32
    bq = qb.shape[0]
    t_pad = k_ref.shape[1]
    n_blocks = t_pad // block_k

    def body(j, acc):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                     (bq, block_k), 1)
        p = jnp.where(col < t_actual, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delt)                            # (BQ, BK)
        return acc + jnp.dot(ds, kb, preferred_element_type=jnp.float32)

    acc0 = jnp.zeros_like(qb)
    acc = jax.lax.fori_loop(0, n_blocks, body, acc0)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, do_ref, k_ref, v_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale: float, t_actual: int,
                          block_q: int):
    """One (batch*head, k-block) program of the flash backward: dK and dV.

    Streams q/dO blocks against this program's resident K/V block;
    zero-padded q rows are masked out of p (they would otherwise
    contribute to the cross-row dK/dV sums).
    """
    kb = k_ref[0].astype(jnp.float32)                   # (BK, Dh)
    vb = v_ref[0].astype(jnp.float32)                   # (BK, Dh)
    bk = kb.shape[0]
    dh = kb.shape[1]
    t_pad = q_ref.shape[1]
    n_blocks = t_pad // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        dob = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :][:, :1]
        delt = delta_ref[0, pl.ds(i * block_q, block_q), :][:, :1]
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        row = i * block_q + jax.lax.broadcasted_iota(jnp.int32,
                                                     (block_q, bk), 0)
        p = jnp.where(row < t_actual, jnp.exp(s - lse), 0.0)   # (BQ, BK)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (BK, Dh)
        dp = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delt)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (BK, Dh)
        return dk_acc, dv_acc

    z = jnp.zeros((bk, dh), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, n_blocks, body, (z, z))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, g,
                    block_q: int = 128, block_k: int = 128):
    """Full Pallas flash backward (Dao et al. algorithm 2): two kernels,
    dQ over the q-grid and (dK, dV) over the k-grid, sharing the saved
    logsumexp plus the standard delta = rowsum(dO ⊙ O) precomputation
    (a cheap fused XLA elementwise+reduce — not worth a kernel)."""
    n, h, t, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    b = n * h
    lcm = math.lcm(block_q, block_k)
    t_pad = lcm * -(-t // lcm)

    def flat_pad(x):
        x = x.reshape(b, t, dh)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0))) \
            if t_pad != t else x

    qf, kf, vf, gf = flat_pad(q), flat_pad(k), flat_pad(v), flat_pad(g)
    # delta rows for zero-padded q rows are 0, and lse pads with 0 (finite):
    # padded rows then contribute exp(s - 0) masked to zero in-kernel.
    # Both ride 8 lanes (Mosaic tiling; kernels read lane 0).
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1).reshape(b, t)
    pad1 = ((0, 0), (0, t_pad - t))

    def row_pad8(x):                                    # (b, t) -> (b, tp, 8)
        x = jnp.pad(x, pad1) if t_pad != t else x
        return jnp.broadcast_to(x[:, :, None], (b, t_pad, 8))

    deltaf = row_pad8(delta)
    lsef = row_pad8(lse.reshape(b, t))
    interpret = jax.default_backend() == "cpu"

    qdh_spec = pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kdh_spec = pl.BlockSpec((1, block_k, dh), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, block_q, 8), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    row_full = pl.BlockSpec((1, t_pad, 8), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, t_actual=t,
                          block_k=block_k),
        grid=(b, t_pad // block_q),
        in_specs=[qdh_spec, full_spec, full_spec, qdh_spec,
                  row_block, row_block],
        out_specs=qdh_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * t * t * dh,
            bytes_accessed=4 * b * t * dh * q.dtype.itemsize,
            transcendentals=b * t * t),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, deltaf)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, t_actual=t,
                          block_q=block_q),
        grid=(b, t_pad // block_k),
        in_specs=[full_spec, full_spec, kdh_spec, kdh_spec,
                  row_full, row_full],
        out_specs=[kdh_spec, kdh_spec],
        out_shape=[jax.ShapeDtypeStruct((b, t_pad, dh), k.dtype),
                   jax.ShapeDtypeStruct((b, t_pad, dh), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=7 * b * t * t * dh,
            bytes_accessed=4 * b * t * dh * q.dtype.itemsize,
            transcendentals=b * t * t),
        interpret=interpret,
    )(qf, gf, kf, vf, lsef, deltaf)

    def trim(x):
        return x[:, :t, :].reshape(n, h, t, dh)

    return trim(dq), trim(dk), trim(dv)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                    ) -> jnp.ndarray:
    """Flash attention (Dao et al., arXiv:2205.14135), TPU Pallas fwd+bwd.

    (N, H, T, Dh) -> (N, H, T, Dh). Forward never materializes the (T, T)
    score matrix in HBM: each (batch*head, 128-row q-block) program streams
    K/V through VMEM with the online-softmax recurrence, f32 accumulators.
    T is padded to the 128 block internally (padded rows masked to -inf)
    so any static T works.

    The backward is the full flash algorithm too (round 3; previously the
    XLA-remat strategy): residuals are (q, k, v, o, lse) — O(T) extra
    state, like the paper — and two Pallas kernels rebuild each softmax
    tile from the saved logsumexp, so neither direction ever writes (T, T)
    scores to HBM. Gradients are exact (f32 tile math). Measured honestly
    in ``bench.py --config 11`` against :func:`attention_xla` autodiff on
    the same draw protocol: on v5e @bf16 ViT-B geometry the grad step is
    0.78x XLA at T=1024 (XLA's regime — scores still cache-friendly),
    ~parity at T=4096, and **4.5x** at T=8192 (89 ms vs 399 ms; fwd is
    6.3x there), where XLA drags (N*H, T, T) f32 score tensors (3.2 GB
    each) through HBM and this path holds O(T). Default stays 'xla' for
    short-sequence ViT/Swin by measurement; pick 'flash' from T≈4k up.
    """
    return _flash_fwd_impl(q, k, v)


def _flash_fwd_rule(q, k, v):
    o, lse = _flash_fwd_impl(q, k, v, return_lse=True)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def scaled_dot_product_attention(q, k, v, impl: str = "xla") -> jnp.ndarray:
    """Dispatch: 'xla' (default — optimal at ViT's T=197) or 'flash'
    (Pallas online-softmax; the long-sequence choice)."""
    if impl == "flash":
        return flash_attention(q, k, v)
    if impl != "xla":
        raise ValueError(f"unknown attention impl {impl!r} "
                         "(known: 'xla', 'flash')")
    return attention_xla(q, k, v)


# --------------------------------------------------------------------------- #
# Transformer modules (torchvision ViT wiring, verified by torch mirrors)
# --------------------------------------------------------------------------- #

def _sub_dot_general(dg, sub: str):
    """Resolve a per-sublayer dot_general: a mapping selects by sub-path
    (per-sublayer calibration scales), a bare callable applies to all."""
    if isinstance(dg, Mapping):
        return dg.get(sub)
    return dg


def _split_dot_general(dg, prefix: str):
    """Narrow a block-level dot_general to one child module: mappings keep
    only the '<prefix>/...' entries (keys stripped), callables pass through
    — the one copy of the prefix-split both block types use."""
    if isinstance(dg, Mapping):
        picked = {k.split("/", 1)[1]: v for k, v in dg.items()
                  if k.startswith(prefix + "/")}
        return picked or None
    return dg


class MultiHeadSelfAttention(fnn.Module):
    """Self-attention with torch ``nn.MultiheadAttention`` packing: one
    Dense to 3*D whose output columns are [q | k | v] (= in_proj_weight
    rows), heads as contiguous Dh chunks, Dense out projection.

    ``dropout_prob`` drops entries of the softmaxed ATTENTION-PROBABILITY
    matrix (torch ``nn.MultiheadAttention(dropout=...)`` semantics) — the
    encoder block's own dropout handles the output path. Probability
    dropout requires materialized probabilities, so it is incompatible
    with ``attn_impl='flash'`` (raises when both are set and training
    would drop)."""
    num_heads: int
    dropout_prob: float = 0.0
    attn_impl: str = "xla"
    dot_general: Any = None       # int8/QAT dot override for the projections
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        n, t, d = x.shape
        h = int(self.num_heads)
        if d % h:
            raise ValueError(f"embed dim {d} not divisible by {h} heads")
        dh = d // h
        dg_q = _sub_dot_general(self.dot_general, "qkv")
        dg_o = _sub_dot_general(self.dot_general, "out")
        qkv = fnn.Dense(3 * d, dtype=self.dtype,
                        kernel_init=xavier_uniform_with_gain(1.0),
                        name="qkv",
                        **({"dot_general": dg_q} if dg_q else {}))(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(n, t, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        drop = float(self.dropout_prob or 0.0)
        if drop > 0.0:
            if self.attn_impl == "flash":
                raise ValueError(
                    "attention-probability dropout needs materialized "
                    "probabilities; use attn_impl='xla' when "
                    "attn_dropout > 0 (flash never forms the (T, T) matrix)")
            s = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                           preferred_element_type=jnp.float32) / math.sqrt(dh)
            p = jax.nn.softmax(s, axis=-1)
            p = fnn.Dropout(rate=drop, deterministic=not train)(p)
            o = jnp.einsum("nhqk,nhkd->nhqd", p.astype(v.dtype), v)
        else:
            o = scaled_dot_product_attention(q, k, v, impl=self.attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(n, t, d)
        return fnn.Dense(d, dtype=self.dtype,
                         kernel_init=xavier_uniform_with_gain(1.0),
                         name="out",
                         **({"dot_general": dg_o} if dg_o else {}))(o)


class MlpBlock(fnn.Module):
    """Transformer MLP: Dense(mlp_dim) -> exact GELU -> dropout ->
    Dense(d) -> dropout (torchvision MLPBlock)."""
    mlp_dim: int
    dropout_prob: float = 0.0
    act_fn: Callable = gelu_exact
    dot_general: Any = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        d = x.shape[-1]
        dg1 = _sub_dot_general(self.dot_general, "fc1")
        dg2 = _sub_dot_general(self.dot_general, "fc2")
        y = fnn.Dense(int(self.mlp_dim), dtype=self.dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="fc1",
                      **({"dot_general": dg1} if dg1 else {}))(x)
        y = self.act_fn(y)
        if self.dropout_prob and self.dropout_prob > 0.0:
            y = fnn.Dropout(rate=float(self.dropout_prob),
                            deterministic=not train)(y)
        y = fnn.Dense(d, dtype=self.dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="fc2",
                      **({"dot_general": dg2} if dg2 else {}))(y)
        if self.dropout_prob and self.dropout_prob > 0.0:
            y = fnn.Dropout(rate=float(self.dropout_prob),
                            deterministic=not train)(y)
        return y


class TransformerEncoderBlock(fnn.Module):
    """Pre-LN encoder block, torchvision ``EncoderBlock`` wiring:
    x + drop(attn(ln_1(x))); then x + mlp(ln_2(x)).

    ``drop_path_prob`` adds stochastic depth (Huang et al.,
    arXiv:1603.09382; standard for ViT training): each residual BRANCH is
    dropped per sample with that probability during training (surviving
    branches rescaled by 1/(1-p)) — implemented as a batch-broadcast
    Dropout so one Bernoulli draw gates the whole branch of a sample."""
    num_heads: int
    mlp_dim: int
    dropout_prob: float = 0.0
    attn_dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    attn_impl: str = "xla"
    dot_general: Any = None       # int8/QAT dot override for all projections
    ln_eps: float = 1e-6
    norm: str = "layer_norm"      # or 'rms_norm' (scale-only, single
                                  # reduction — the cheaper TPU norm;
                                  # LayerNorm stays default for torch parity)
    moe: Any = None               # replace the dense MLP with a V-MoE
                                  # MoEMlp: {num_experts, k,
                                  # capacity_factor, ...}
    mlp_act: str = "gelu"         # 'gelu' (exact erf — torch parity) or
                                  # 'gelu_tanh' (measured ~23% faster MLP
                                  # stack on v5e; timm's approximate mode)
    dtype: Any = None             # compute dtype (None = input dtype)

    def _drop_path(self, v, train: bool):
        from deepcv_tpu.ops.nn import DropPath
        return DropPath(rate=float(self.drop_path_prob))(v, train=train)

    def _norm(self, name: str):
        # same param path names (ln_1/ln_2) whichever norm, so int8
        # calibration subpaths and sharding rules apply unchanged
        from deepcv_tpu.ops.nn import make_token_norm
        return make_token_norm(self.norm, self.ln_eps, self.dtype, name)

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        y = self._norm("ln_1")(x)
        y = MultiHeadSelfAttention(num_heads=self.num_heads,
                                   dropout_prob=self.attn_dropout_prob,
                                   attn_impl=self.attn_impl,
                                   dot_general=_split_dot_general(self.dot_general, "attn"),
                                   dtype=self.dtype, name="attn")(
            y, train=train)
        if self.dropout_prob and self.dropout_prob > 0.0:
            y = fnn.Dropout(rate=float(self.dropout_prob),
                            deterministic=not train)(y)
        x = x + self._drop_path(y, train)
        z = self._norm("ln_2")(x)
        if self.moe:
            from deepcv_tpu.ops.moe import MoEMlp
            cfg = dict(self.moe)
            z = MoEMlp(num_experts=int(cfg["num_experts"]),
                       mlp_dim=int(cfg.get("mlp_dim", self.mlp_dim)),
                       k=int(cfg.get("k", 1)),
                       capacity_factor=float(cfg.get("capacity_factor", 1.25)),
                       router_noise=float(cfg.get("router_noise", 0.0)),
                       group_size=int(cfg.get("group_size", 0)),
                       mlp_act=self.mlp_act,
                       dtype=self.dtype, name="moe_mlp")(z, train=train)
        else:
            if self.mlp_act == "gelu":
                act = gelu_exact
            elif self.mlp_act == "gelu_tanh":
                act = jax.nn.gelu          # approximate=True: tanh form
            else:
                raise ValueError(f"mlp_act must be 'gelu' or 'gelu_tanh', "
                                 f"got {self.mlp_act!r}")
            z = MlpBlock(mlp_dim=self.mlp_dim, dropout_prob=self.dropout_prob,
                         act_fn=act,
                         dot_general=_split_dot_general(self.dot_general, "mlp"),
                         dtype=self.dtype, name="mlp")(z, train=train)
        return x + self._drop_path(z, train)


class PatchEmbed(fnn.Module):
    """Patchify + linear embed + [cls] token + learned position embedding.

    The stride-p "conv" is a reshape + Dense: each p x p patch is flattened
    (row-major, channels fastest — the (kh, kw, c) order the torch mirror
    transposes conv_proj weights into) and hits one (p*p*C, D) matmul on
    the MXU. Position table is sized lazily from the input's token count,
    so one module serves any square-divisible input size (torchvision
    interpolates its table instead; at build time the count is static
    either way)."""
    patch_size: int
    embed_dim: int
    use_cls_token: bool = True
    dropout_prob: float = 0.0
    dot_general: Any = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        n, hgt, wid, c = x.shape
        p = int(self.patch_size)
        if hgt % p or wid % p:
            raise ValueError(f"input {hgt}x{wid} not divisible by "
                             f"patch_size={p}")
        gh, gw = hgt // p, wid // p
        x = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(n, gh * gw, p * p * c)
        dg_p = _sub_dot_general(self.dot_general, "proj")
        x = fnn.Dense(int(self.embed_dim), dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="proj",
                      **({"dot_general": dg_p} if dg_p else {}))(x)
        t = gh * gw
        d = int(self.embed_dim)
        if self.use_cls_token:
            cls = self.param("cls_token", fnn.initializers.zeros,
                             (1, 1, d), self.param_dtype)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (n, 1, d)), x], axis=1)
            t += 1
        pos = self.param("pos_embedding",
                         fnn.initializers.normal(stddev=0.02),
                         (1, t, d), self.param_dtype)
        x = x + pos.astype(x.dtype)
        if self.dropout_prob and self.dropout_prob > 0.0:
            x = fnn.Dropout(rate=float(self.dropout_prob),
                            deterministic=not train)(x)
        return x


def resize_pos_embedding(variables, new_hw: int, patch_size: int,
                         embed_node: str = "node_impls_embed",
                         method: str = "cubic"):
    """Fine-tune a trained ViT at a new resolution: bicubic-resample the
    learned position table's GRID part to the new token count (torchvision
    ``interpolate_embeddings`` semantics — the [cls] slot is preserved
    untouched). Returns a new variables pytree; everything else is shared
    by reference (patch/attention weights are resolution-agnostic).

    ``new_hw`` is the new square input size; the new grid is
    (new_hw // patch_size)².
    """
    params = dict(variables["params"])
    node = dict(params[embed_node])
    pos = node["pos_embedding"]                     # (1, T, D)
    has_cls = "cls_token" in node
    grid_part = pos[:, 1:] if has_cls else pos
    t_old = grid_part.shape[1]
    side_old = int(round(math.sqrt(t_old)))
    if side_old * side_old != t_old:
        raise ValueError(f"position table's grid part has {t_old} tokens — "
                         "not square; cannot infer the old grid")
    side_new = int(new_hw) // int(patch_size)
    if int(new_hw) % int(patch_size):
        raise ValueError(f"new_hw={new_hw} not divisible by "
                         f"patch_size={patch_size}")
    d = pos.shape[-1]
    grid = grid_part.reshape(1, side_old, side_old, d)
    grid = jax.image.resize(grid, (1, side_new, side_new, d), method=method)
    grid = grid.reshape(1, side_new * side_new, d)
    node["pos_embedding"] = jnp.concatenate([pos[:, :1], grid], axis=1) \
        if has_cls else grid
    params[embed_node] = node
    return {**variables, "params": params}


class TakeToken(fnn.Module):
    """(N, T, D) -> (N, D): select one token (the [cls] head input)."""
    index: int = 0

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        return x[:, int(self.index)]


# --------------------------------------------------------------------------- #
# Windowed attention (Swin family — Liu et al., arXiv:2103.14030)
# --------------------------------------------------------------------------- #

def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N * nH * nW, w*w, C) — pure reshapes."""
    n, h, wid, c = x.shape
    x = x.reshape(n, h // w, w, wid // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(win: jnp.ndarray, w: int, h: int, wid: int) -> jnp.ndarray:
    """Inverse of :func:`_window_partition`."""
    c = win.shape[-1]
    x = win.reshape(-1, h // w, wid // w, w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, wid, c)


def _relative_position_index(w: int) -> np.ndarray:
    """Static (w*w, w*w) index into the (2w-1)^2 relative-bias table
    (Swin's standard construction)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)   # (2, w*w)
    rel = coords[:, :, None] - coords[:, None, :]                  # (2, T, T)
    rel = rel.transpose(1, 2, 0) + (w - 1)                         # to >= 0
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_attention_mask(h: int, wid: int, w: int, shift: int) -> np.ndarray:
    """Static additive mask (nWindows, w*w, w*w) for shifted windows:
    tokens that were NOT neighbors before the cyclic shift (wrapped-around
    content) must not attend to each other. The region labels are defined
    directly in SHIFTED coordinates (the official Swin construction —
    rows/cols [0, -w) are contiguous interior, [-w, -shift) and
    [-shift, 0) are the two sides of the wrap seam); -1e9 on cross-region
    pairs."""
    img = np.zeros((h, wid), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // w, w, wid // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)                                   # (nW, T)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


class WindowAttention(fnn.Module):
    """(Shifted-)window multi-head self-attention on a spatial map
    (Swin W-MSA / SW-MSA): attention is computed inside non-overlapping
    w x w windows with a learned relative-position bias; ``shift = w // 2``
    cyclically shifts the map first and masks cross-region pairs (the
    static mask is built from the shapes at trace time). Input and output
    are (N, H, W, C) — window partition/reverse are pure reshapes, so the
    whole op is a few batched (w², w²) MXU matmuls; H and W must be
    multiples of ``window``."""
    num_heads: int
    window: int = 7
    shift: int = 0
    dot_general: Any = None       # int8/QAT dot override for the projections
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        n, h, wid, c = x.shape
        nh = int(self.num_heads)
        # official Swin convention: when the map is no larger than the
        # window, attention is global — clamp the window and drop the shift
        # (shifting a full-map window is a no-op modulo the wrap mask)
        w = min(int(self.window), h, wid)
        shift = int(self.shift) if w < min(h, wid) else 0
        if h % w or wid % w:
            raise ValueError(f"feature map {h}x{wid} not divisible by "
                             f"window={w}")
        if c % nh:
            raise ValueError(f"dim {c} not divisible by {nh} heads")
        dh = c // nh
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        t = w * w
        win = _window_partition(x, w)                   # (B, T, C)
        dg_q = _sub_dot_general(self.dot_general, "qkv")
        dg_o = _sub_dot_general(self.dot_general, "out")
        qkv = fnn.Dense(3 * c, dtype=self.dtype,
                        kernel_init=xavier_uniform_with_gain(1.0),
                        name="qkv",
                        **({"dot_general": dg_q} if dg_q else {}))(win)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(-1, t, nh, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(dh)
        table = self.param("rel_pos_bias",
                           fnn.initializers.normal(stddev=0.02),
                           ((2 * w - 1) ** 2, nh), jnp.float32)
        idx = jnp.asarray(_relative_position_index(w))
        bias = table[idx.reshape(-1)].reshape(t, t, nh).transpose(2, 0, 1)
        s = s + bias[None].astype(s.dtype)
        if shift:
            mask = jnp.asarray(_shift_attention_mask(h, wid, w, shift))
            nw = mask.shape[0]
            s = s.reshape(n, nw, nh, t, t) + mask[None, :, None]
            s = s.reshape(-1, nh, t, t)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(-1, t, c)
        o = fnn.Dense(c, dtype=self.dtype,
                      kernel_init=xavier_uniform_with_gain(1.0),
                      name="out",
                      **({"dot_general": dg_o} if dg_o else {}))(o)
        x = _window_reverse(o, w, h, wid)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        return x


class SwinBlock(fnn.Module):
    """Pre-LN Swin transformer block on a spatial map: x + drop_path(
    (S)W-MSA(ln_1(x))); x + drop_path(MLP(ln_2(x))) — exact-GELU 4x MLP,
    LayerNorm over channels (channel-last maps make torch's permutes
    vanish)."""
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path_prob: float = 0.0
    dot_general: Any = None       # int8/QAT dot override for all projections
    ln_eps: float = 1e-5
    norm: str = "layer_norm"      # or 'rms_norm' (same ln_1/ln_2 paths)
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        from deepcv_tpu.ops.nn import DropPath, make_token_norm
        dp = DropPath(rate=float(self.drop_path_prob))

        y = make_token_norm(self.norm, self.ln_eps, self.dtype, "ln_1")(x)
        y = WindowAttention(num_heads=self.num_heads, window=self.window,
                            shift=self.shift, dot_general=_split_dot_general(self.dot_general, "attn"),
                            dtype=self.dtype,
                            name="attn")(y, train=train)
        x = x + dp(y, train=train)
        z = make_token_norm(self.norm, self.ln_eps, self.dtype, "ln_2")(x)
        z = MlpBlock(mlp_dim=int(round(x.shape[-1] * float(self.mlp_ratio))),
                     dot_general=_split_dot_general(self.dot_general, "mlp"),
                     dtype=self.dtype, name="mlp")(z, train=train)
        return x + dp(z, train=train)


class PatchMerging(fnn.Module):
    """Swin between-stage downsampling: concat 2x2 neighbors (C -> 4C),
    LayerNorm, Linear 4C -> 2C (bias-free). The 4C concatenation order is
    TORCH's (x0=h0w0, x1=h1w0, x2=h0w1, x3=h1w1 — the h-offset varies
    fastest), so torch Swin checkpoints port with a plain transpose of the
    ln/reduce weights, no channel permutation."""
    ln_eps: float = 1e-5
    dot_general: Any = None
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(f"feature map {h}x{w} not divisible by 2")
        x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
        x = x.reshape(n, h // 2, w // 2, 4 * c)
        x = fnn.LayerNorm(epsilon=float(self.ln_eps), dtype=self.dtype,
                          name="ln")(x)
        dg = _sub_dot_general(self.dot_general, "reduce")
        return fnn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                         kernel_init=xavier_uniform_with_gain(1.0),
                         name="reduce",
                         **({"dot_general": dg} if dg else {}))(x)
