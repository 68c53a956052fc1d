"""The video toolbox end to end: Y4M interchange -> stabilization ->
lossless compression to the learned codec container -> mesh-distributed
frame inference.

Covers the reference's video-tooling TODO cluster (README.md:157-166) in
one runnable script on synthetic footage.

Run: ``python examples/video_toolkit.py``  (CPU-friendly; tiny shapes)
"""
import numpy as np
import jax
import jax.numpy as jnp

from deepcv_tpu.codec import LosslessVideoCodec
from deepcv_tpu.data.video_io import (iter_y4m, process_video, read_dvv,
                                      read_y4m, write_dvv, write_y4m,
                                      y4m_to_memmap)
from deepcv_tpu.parallel import make_mesh
from deepcv_tpu.pipelines.geometry import stabilize_video


def shaky_footage(t=12, size=32, seed=0):
    """A textured scene under a jittery camera (integer shifts)."""
    rng = np.random.default_rng(seed)
    world = np.kron(rng.uniform(0, 1, (12, 12, 3)), np.ones((8, 8, 1)))
    jitter = rng.integers(-3, 4, (t, 2))
    frames = [world[24 + dy:24 + dy + size, 24 + dx:24 + dx + size]
              for dy, dx in jitter]
    return (np.stack(frames) * 255).astype(np.uint8)


def main(outdir="data/07_video/example"):
    import os
    os.makedirs(outdir, exist_ok=True)
    frames = shaky_footage()

    # 1. Y4M interchange: any video tool can produce/consume this file
    write_y4m(f"{outdir}/shaky.y4m", frames, fps=(24, 1), chroma="444")
    clip, meta = read_y4m(f"{outdir}/shaky.y4m")
    print(f"y4m: {clip.shape} @ {meta.fps[0]}/{meta.fps[1]} fps")

    # 2. stabilize (phase-correlation global motion, smoothed trajectory)
    stable, trajectory = stabilize_video(jnp.asarray(clip, jnp.float32) / 255.0)
    stable = np.asarray(stable)
    stable_u8 = (stable * 255).clip(0, 255).astype(np.uint8)
    write_y4m(f"{outdir}/stable.y4m", stable_u8, fps=(24, 1), chroma="444")

    # 3. learned lossless compression into a .dvv container
    codec = LosslessVideoCodec((32, 32, 3), n_scales=2, hidden=16, seed=0)
    codec.fit(clip[None], steps=60, batch_size=8, seed=1)
    write_dvv(f"{outdir}/shaky.dvv", [clip], codec)
    back = read_dvv(f"{outdir}/shaky.dvv", codec)
    raw, coded = clip.size, os.path.getsize(f"{outdir}/shaky.dvv")
    assert (back[0] == clip).all(), "codec must be lossless"
    print(f"dvv: {raw} raw bytes -> {coded} coded ({raw / coded:.2f}x), "
          "exact roundtrip")

    # 4. distributed frame processing: every batch sharded over the mesh
    n = jax.device_count()
    mesh = make_mesh({"data": n})
    stats = process_video(
        iter_y4m(f"{outdir}/stable.y4m")[1],        # streams frame by frame
        jax.jit(lambda x: x.astype(jnp.float32).mean((1, 2, 3))),
        batch_size=max(4, n), mesh=mesh)
    print(f"process_video over {n} device(s): per-frame means "
          f"{np.round(stats[:4], 1)} ...")

    # 5. video -> training-ready memmap
    mm = y4m_to_memmap(f"{outdir}/stable.y4m", f"{outdir}/stable.npy")
    print(f"memmap: {mm.shape} uint8 at {outdir}/stable.npy")


if __name__ == "__main__":
    main()
