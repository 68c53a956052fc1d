"""Probe: tree vs born-flat param storage on the ResNet-50 BN train step.

r4 verdict #3 follow-up. bench --config 9 measured flat_params net-neutral
(2536 vs 2558 img/s); this probe profiles the isolated jitted step both ways
(xplane per-op device times) to see where the per-tensor optimizer bucket
went — the working hypothesis is that the forward's unravel slices turn into
per-conv-weight relayout copies that cost what the fused update saves.

Usage: python benchmarks/_flat_probe.py [--batch 256] [--mode tree|flat|both]
"""
import argparse
import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(batch):
    from deepcv_tpu.spec import DeepcvModule
    from deepcv_tpu.spec.zoo import resnet_spec

    model = DeepcvModule((224, 224, 3),
                         resnet_spec(50, num_classes=1000, pool_kernel=7),
                         dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, (batch,)), jnp.int32)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.1, momentum=0.9))
    return model, v, x, y, tx


def make_step(model, v, tx, flat):
    from jax.flatten_util import ravel_pytree

    if flat:
        p0, p_unravel = ravel_pytree(v["params"])
        bs0, bs_unravel = ravel_pytree(v["batch_stats"])
    else:
        p0, bs0 = v["params"], v["batch_stats"]

    def loss_fn(params, bs, x, y):
        if flat:
            params, bs = p_unravel(params), bs_unravel(bs)
        out, st = model.apply({"params": params, "batch_stats": bs}, x,
                              train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(1)})
        logits = out.astype(jnp.float32)
        ce = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(x.shape[0]), y])
        new_bs = st["batch_stats"]
        if flat:
            new_bs = ravel_pytree(new_bs)[0]
        return ce, new_bs

    opt0 = tx.init(p0)

    @jax.jit
    def step(params, bs, opt, x, y):
        (ce, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bs, x, y)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, ce

    return step, p0, bs0, opt0


def profile(name, step, p0, bs0, opt0, x, y):
    from deepcv_tpu.profiling import trace, xplane_op_summary

    p, bs, opt = p0, bs0, opt0
    for _ in range(3):
        p, bs, opt, ce = step(p, bs, opt, x, y)
    jax.block_until_ready(ce)
    log = f"/tmp/flat_probe_{name}"
    iters = 5
    with trace(log):
        for _ in range(iters):
            p, bs, opt, ce = step(p, bs, opt, x, y)
        jax.block_until_ready(ce)
    # per-op events only — the module-level jit_step TraceMe on other lines
    # spans the whole step and would double the total
    rows = [r for r in xplane_op_summary(log) if r["line"] == "XLA Ops"]
    total = sum(r["total_ms"] for r in rows) / iters
    # bucket by op family
    buckets = collections.Counter()
    counts = collections.Counter()
    for r in rows:
        n = r["op"]
        if "convolution" in n or n.startswith("%conv"):
            b = "conv+epilogue"
        elif "dynamic-update-slice" in n or "concatenate" in n:
            b = "concat/DUS (ravel side)"
        elif re.search(r"copy|bitcast|transpose|slice", n):
            b = "copy/slice/relayout"
        elif "reduce" in n:
            b = "reductions"
        elif "fusion" in n:
            b = "elementwise fusions"
        else:
            b = "other"
        buckets[b] += r["total_ms"] / iters
        counts[b] += r["count"] / iters
    print(f"\n== {name}: total device {total:.2f} ms/step ==")
    for b, ms in buckets.most_common():
        print(f"  {b:28s} {ms:7.2f} ms  (~{counts[b]:.0f} kernels)")
    top = sorted(rows, key=lambda r: -r["total_ms"])[:12]
    for r in top:
        print(f"    {r['total_ms'] / iters:7.3f} ms x{r['count']:<4d} "
              f"{r['op'][:85]}")
    return total


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--mode", default="both", choices=["tree", "flat", "both"])
    args = ap.parse_args()
    model, v, x, y, tx = build(args.batch)
    results = {}
    for mode in (["tree", "flat"] if args.mode == "both" else [args.mode]):
        step, p0, bs0, opt0 = make_step(model, v, tx, flat=(mode == "flat"))
        results[mode] = profile(mode, step, p0, bs0, opt0, x, y)
    if len(results) == 2:
        print(f"\nflat/tree device time: {results['flat'] / results['tree']:.3f}")
