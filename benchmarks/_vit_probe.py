"""ViT-B/16 train-step decomposition probe (dev tool; numbers recorded in
docs/design.md): why does dense ViT train at ~10% MFU while the CNN zoo
reaches 60%+? Sweeps batch x attn_impl x (dense|moe), times fwd and full
SGD step separately, median of 5 warm draws."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import optax

from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.spec.zoo import vit_spec

PEAK = 197e12  # v5e bf16
# ViT-B/16 @224 is 17.58 GMACs/img (timm) = 35.2 GFLOPs (2 flops/MAC)
FWD_GFLOPS = 35.2


def timed(fn, *args, reps=5):
    # device_get of a scalar reduction, NOT block_until_ready: the axon
    # tunnel returns from block_until_ready before execution finishes
    # (same protocol as bench.py)
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(jnp.sum(leaf))
    sync(fn(*args))
    draws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        draws.append(time.perf_counter() - t0)
    return sorted(draws)[len(draws) // 2]


def probe(batch, attn, moe, remat=False, norm="layer_norm", mlp_act="gelu",
          opt="sgd"):
    hp = vit_spec("b_16", num_classes=1000, attn_impl=attn,
                  moe_experts=8 if moe else 0, moe_every=2,
                  moe_group_size=4 * 197, norm=norm, mlp_act=mlp_act)
    m = DeepcvModule((224, 224, 3), hp, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0))
    params = v["params"]
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3),
                          jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 1000)
    from deepcv_tpu.train.training import build_optimizer
    tx = build_optimizer(opt, {"lr": 0.1, "momentum": 0.9}
                         if opt == "sgd" else {"lr": 1e-3})
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        out = m.apply({"params": p}, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(3)},
                      mutable=["moe_losses"] if moe else False)
        logits = out[0] if moe else out
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y).mean()

    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())

    fwd = jax.jit(loss_fn)
    @jax.jit
    def step(p, o, x, y):
        g = jax.grad(loss_fn)(p, x, y)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    t_f = timed(fwd, params, x, y)
    t_s = timed(lambda p, o: step(p, o, x, y)[0], params, opt_state)
    img_s = batch / t_s
    mfu = img_s * 3 * FWD_GFLOPS * 1e9 / PEAK
    print(f"b={batch:4d} attn={attn:5s} moe={int(moe)} remat={int(remat)} "
          f"norm={norm:10s} act={mlp_act:9s} opt={opt:9s}: "
          f"fwd {t_f*1e3:7.2f} ms  step {t_s*1e3:7.2f} ms "
          f"(bwd/fwd {t_s/t_f - 1:.2f})  {img_s:7.1f} img/s  ~{mfu*100:.1f}% MFU",
          flush=True)


if __name__ == "__main__":
    if "--opts" in sys.argv:
        # optimizer step cost on the full model (same fwd/bwd program):
        # muon adds 5 NS matmuls per 2-D weight; adafactor/lion trade
        # state memory for (negligible) elementwise work
        for o in ("sgd", "adamw", "muon", "adafactor", "lion"):
            probe(256, "xla", moe=False, opt=o)
        raise SystemExit(0)
    if "--norms" in sys.argv:
        # the activation-norm lever (design.md §5.13): LN vs RMS, and the
        # combined fast config (rms + tanh GELU)
        probe(256, "xla", moe=False)
        probe(256, "xla", moe=False, norm="rms_norm")
        probe(256, "xla", moe=False, norm="rms_norm", mlp_act="gelu_tanh")
        raise SystemExit(0)
    for batch in (128, 256):
        for attn in ("xla", "flash"):
            probe(batch, attn, moe=False)
    probe(128, "xla", moe=True)
    probe(256, "xla", moe=False, remat=True)
