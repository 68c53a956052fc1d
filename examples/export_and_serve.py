"""From trained variables to deployment: model bundle (rehydratable with the
framework) and StableHLO artifact (runs with jax alone), then batched serving
through Predictor.

Run: ``python examples/export_and_serve.py``
"""
import numpy as np
import jax

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.serve import (Predictor, save_model_bundle, load_model_bundle,
                              export_stablehlo, load_stablehlo)

MODEL = """
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 16, padding: 1 }
  - flatten: {}
  - fully_connected: { out_features: 10, act_fn: null }
"""


def main(outdir="data/06_models/example"):
    model = DeepcvModule((32, 32, 3), load_yaml(MODEL))
    variables = model.init(jax.random.PRNGKey(0))   # swap in trained variables

    # 1. framework bundle: model.yaml + variables, backend-portable
    bundle = save_model_bundle(f"{outdir}/bundle", model, variables)
    model2, variables2 = load_model_bundle(bundle)

    # 2. StableHLO: params baked in, consumable with jax alone
    artifact = export_stablehlo(f"{outdir}/model.stablehlo", model, variables,
                                batch_size=8)
    f = load_stablehlo(artifact)

    # 3. serve: ragged batches pad to one compiled program
    images = np.random.default_rng(0).integers(
        0, 256, (20, 32, 32, 3)).astype(np.uint8)
    pred = Predictor(model2, variables2, batch_size=8)
    probs = pred(images.astype(np.float32) / 255.0)
    mean, std = pred.predict_with_uncertainty(
        images[:4].astype(np.float32) / 255.0, n_samples=4)
    print("bundle:", bundle, "| stablehlo bytes:", artifact.stat().st_size)
    print("predictions:", probs.shape, "| MC-dropout std mean:",
          float(std.mean()))
    print("stablehlo forward:",
          np.asarray(f((images[:8].astype(np.float32) / 255.0))).shape)
    print("throughput:", pred.benchmark(batch=64, n_iters=5))


if __name__ == "__main__":
    main()
