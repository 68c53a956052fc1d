"""Mixture-of-Experts MLP — the EP (expert-parallel) member of the toolbox.

Beyond-reference capability (the reference DeepCV has no MoE and no
parallelism beyond DP — SURVEY §2.9): this is the V-MoE recipe (Riquelme
et al., arXiv:2106.05974 — MoE for vision transformers) built the TPU way:

* **static shapes everywhere**: routing is expressed as one-hot dispatch /
  combine tensors of shape (groups, tokens, experts, capacity) contracted
  with einsums — no gather/scatter, no dynamic shapes, so the whole block
  jits and the MXU does the routing;
* **grouped routing** (the V-MoE/Mesh-TF formulation): tokens are routed
  within fixed-size groups, so the dispatch tensor is
  ``G x gs x E x C`` with ``C ∝ gs`` — memory and dispatch-einsum FLOPs
  stay LINEAR in total tokens (a single global group would be quadratic:
  ``S x E x (S·k·cf/E)``, infeasible past a few thousand tokens);
* **expert parallelism through GSPMD**: expert weights are stacked with a
  leading E dim; shard that dim over a mesh axis
  (:func:`expert_parallel_rules`) and XLA inserts the all-to-alls that
  move token slots to their expert's chip — the scaling-book recipe
  (annotate shardings, let the compiler place collectives), not hand-MPI;
* **f32 router**: routing logits/softmax in float32 regardless of the
  compute dtype (bf16 router logits are the classic MoE instability);
* **capacity discipline**: each expert processes a static
  ``ceil(k * gs / E * capacity_factor)`` slot buffer per group; overflow
  tokens fall through the residual connection (their MoE output is exactly
  0), the standard Switch/V-MoE behavior;
* **load-balance aux loss** (Switch Transformer eq. 4, arXiv:2101.03961):
  computed per group and averaged, sown into the ``moe_losses``
  collection; ``train()`` adds ``hp['moe_aux_weight']`` x its mean to the
  objective.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from deepcv_tpu.ops.attention import gelu_exact

__all__ = ["MoEMlp", "expert_parallel_rules", "MOE_LOSSES_COLLECTION"]

#: flax collection name the aux losses are sown into
MOE_LOSSES_COLLECTION = "moe_losses"


class MoEMlp(fnn.Module):
    """Token-routed MLP: each token is processed by its top-k of E expert
    MLPs (same geometry as the dense ``MlpBlock`` it replaces: Dense(mlp)
    -> GELU (exact by default; ``mlp_act='gelu_tanh'`` for the measured
    fast form) -> Dense(d)).

    Input (N, T, D) or (S, D); output the same shape. Tokens beyond an
    expert's per-group capacity get a zero output (they ride the
    transformer block's residual connection unchanged).

    ``group_size`` (tokens) bounds the routing-group size: a batch of
    (N, T) tokens is split into groups of ``max(1, group_size // T)``
    whole images (rounded down to a divisor of N so shapes stay static).
    0 = one global group — exact but quadratic; fine for tests/small
    inputs, set a few hundred to a few thousand for real training
    (V-MoE routes within groups of this scale).

    ``router_noise`` (train only) multiplies routing logits by
    U[1-eps, 1+eps] — Switch's load-balancing jitter; draws from the
    ``dropout`` rng stream the training loop already provides.
    """
    num_experts: int
    mlp_dim: int
    k: int = 1
    capacity_factor: float = 1.25
    router_noise: float = 0.0
    group_size: int = 0
    mlp_act: str = "gelu"         # 'gelu' (exact erf) or 'gelu_tanh' — the
                                  # same lever as the dense MlpBlock's
    dtype: Any = None

    @fnn.compact
    def __call__(self, x, *, train: bool = False):
        if not (1 <= int(self.k) <= int(self.num_experts)):
            raise ValueError(f"k={self.k} must be in [1, E={self.num_experts}]")
        orig_shape = x.shape
        d = x.shape[-1]
        total = 1
        for s in x.shape[:-1]:
            total *= int(s)

        # ------- group layout: (G, gs, D) --------------------------------- #
        # groups are whole leading-dim items (images) so N, T grouping is
        # static; group_size=0 -> one global group (the exact small case).
        # The requested size rounds DOWN to the largest static divisor so
        # shapes never go dynamic (128 imgs @ 5-per-group -> 4-per-group).
        def _largest_divisor_leq(n: int, cap_: int) -> int:
            return max(d for d in range(1, min(n, cap_) + 1) if n % d == 0)

        if int(self.group_size) > 0 and x.ndim >= 3:
            n, t = int(x.shape[0]), int(total // x.shape[0])
            per = _largest_divisor_leq(n, max(1, int(self.group_size) // t))
            g, gs = n // per, per * t
        elif int(self.group_size) > 0 and int(self.group_size) < total:
            gs = _largest_divisor_leq(total, int(self.group_size))
            g = total // gs
        else:
            g, gs = 1, total
        xs = x.reshape(g, gs, d)
        e, m = int(self.num_experts), int(self.mlp_dim)
        cap = max(1, int(math.ceil(
            int(self.k) * gs / e * float(self.capacity_factor))))
        cap = min(cap, gs)

        # ------- router (f32 regardless of compute dtype) ------------------ #
        wr = self.param("router", fnn.initializers.lecun_normal(),
                        (d, e), jnp.float32)
        logits = jnp.einsum("gsd,de->gse", xs.astype(jnp.float32), wr)
        if train and float(self.router_noise) > 0.0:
            eps = float(self.router_noise)
            u = jax.random.uniform(self.make_rng("dropout"), logits.shape,
                                   jnp.float32, 1.0 - eps, 1.0 + eps)
            logits = logits * u
        probs = jax.nn.softmax(logits, axis=-1)            # (G, S, E) f32

        # ------- top-k dispatch with per-expert capacity -------------------- #
        # choice j's tokens claim buffer slots after choices < j (the
        # standard priority ordering: first choices never lose their slot
        # to someone's second choice)
        remaining = probs
        counts = jnp.zeros((g, e), jnp.float32)            # slots used so far
        dispatch = jnp.zeros((g, gs, e, cap), jnp.float32)
        combine = jnp.zeros((g, gs, e, cap), jnp.float32)
        first_mask = None
        for _ in range(int(self.k)):
            ej = jnp.argmax(remaining, axis=-1)            # (G, S)
            pj = jnp.take_along_axis(probs, ej[..., None], axis=-1)[..., 0]
            maskj = jax.nn.one_hot(ej, e, dtype=jnp.float32)
            if first_mask is None:
                first_mask = maskj
            pos = ((jnp.cumsum(maskj, axis=1) - 1.0) * maskj
                   + counts[:, None, :] * maskj)
            within = jnp.sum(pos, axis=-1)                 # (G, S)
            keep = (within < cap).astype(jnp.float32)
            slot = jax.nn.one_hot(within.astype(jnp.int32), cap,
                                  dtype=jnp.float32)       # (G, S, C)
            dj = jnp.einsum("gse,gsc->gsec", maskj * keep[..., None], slot)
            dispatch = dispatch + dj
            combine = combine + dj * pj[..., None, None]
            counts = counts + jnp.sum(maskj * keep[..., None], axis=1)
            remaining = remaining * (1.0 - maskj)          # mask this choice

        # ------- load balance aux (Switch eq. 4; 1.0 at perfect balance) --- #
        frac_routed = jnp.mean(first_mask, axis=1)         # (G, E) f_e
        mean_prob = jnp.mean(probs, axis=1)                # (G, E) P_e
        aux = e * jnp.mean(jnp.sum(frac_routed * mean_prob, axis=-1))
        # overwrite (not append/accumulate): each apply's aux replaces any
        # value carried in from the caller's variables, so the collection
        # holds exactly this forward's loss
        self.sow(MOE_LOSSES_COLLECTION, "load_balance", aux,
                 reduce_fn=lambda a, b: b, init_fn=lambda: jnp.float32(0))

        # ------- expert compute: stacked weights, einsum over E ------------- #
        # leading E dim is THE expert-parallel shard dim (see
        # expert_parallel_rules); xavier gains match the dense MlpBlock
        from deepcv_tpu.ops.nn import xavier_uniform_with_gain
        xav = xavier_uniform_with_gain(1.0)

        def stack_init(key, shape, dtype=jnp.float32):
            ks = jax.random.split(key, shape[0])
            return jnp.stack([xav(kk, shape[1:], dtype) for kk in ks])

        w1 = self.param("expert_w1", stack_init, (e, d, m))
        b1 = self.param("expert_b1", fnn.initializers.zeros, (e, m))
        w2 = self.param("expert_w2", stack_init, (e, m, d))
        b2 = self.param("expert_b2", fnn.initializers.zeros, (e, d))

        cdt = self.dtype or xs.dtype
        xe = jnp.einsum("gsec,gsd->gecd", dispatch.astype(cdt),
                        xs.astype(cdt))
        if self.mlp_act == "gelu":
            act = gelu_exact
        elif self.mlp_act == "gelu_tanh":
            act = jax.nn.gelu          # approximate=True: tanh form
        else:
            raise ValueError(f"MoEMlp: unknown mlp_act {self.mlp_act!r} "
                             f"(gelu|gelu_tanh)")
        h = act(jnp.einsum("gecd,edm->gecm", xe, w1.astype(cdt))
                + b1[None, :, None, :].astype(cdt))
        ye = (jnp.einsum("gecm,emd->gecd", h, w2.astype(cdt))
              + b2[None, :, None, :].astype(cdt))
        y = jnp.einsum("gsec,gecd->gsd", combine.astype(cdt), ye)
        return y.reshape(orig_shape).astype(x.dtype)


def expert_parallel_rules(params, mesh, expert_axis: str = "model"):
    """NamedSharding rules for EP: stacked expert weights (``expert_*``
    leaves, leading dim E) shard dim 0 over ``mesh[expert_axis]``; every
    other leaf replicates on that axis. Put the params on these shardings
    and jit as usual — GSPMD turns the dispatch/combine einsums into the
    token all-to-alls (scaling-book recipe; no manual collectives).

    E must be divisible by the axis size. Composes with
    :func:`tensor_parallel_rules` on a different axis and DP batch
    sharding on another.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    size = mesh.shape[expert_axis]

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(str(n).startswith("expert_") for n in names):
            if leaf.shape[0] % size:
                raise ValueError(
                    f"num_experts {leaf.shape[0]} not divisible by mesh axis "
                    f"{expert_axis!r} size {size}")
            return NamedSharding(
                mesh, P(expert_axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
