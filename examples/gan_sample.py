"""Hands-on: sample images from a (random or trained) generator and score
them with an assessor — the reference's example_gan_prediction.py shape.
Run: python examples/gan_sample.py [path/to/dcgan/models_dir]"""

import sys
from pathlib import Path

# runnable as a plain script: Python puts the script's dir on sys.path,
# not the cwd, so add the repo root for the package import
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from gan_discovery_pso_tpu.core import seed_all
from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                          generator_init, resnet_init, resnet_apply)
from gan_discovery_pso_tpu.train.dcgan import make_sampler
from gan_discovery_pso_tpu.analysis import reporting


def main():
    keys = seed_all(0)
    gdef = GeneratorDef(z_dim=10)
    if len(sys.argv) > 1:
        from gan_discovery_pso_tpu.pipelines import load_gan

        gp, gs = load_gan(sys.argv[1])
        print(f"loaded generator from {sys.argv[1]}")
    else:
        gp, gs = generator_init(keys("g"), gdef)
        print("using a randomly initialized generator")

    sampler = make_sampler(gdef)
    imgs = sampler(gp, gs, keys("z"), 16)
    reporting.image_grid(np.asarray(imgs), "examples_samples.png", ncols=4)
    print("wrote examples_samples.png")

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(keys("r"), rdef, init="glorot_normal")
    logits, _ = resnet_apply(rp, rs, imgs, rdef)
    probs = jax.nn.softmax(logits, axis=1)
    print("assessor posteriors (row 0):", np.asarray(probs[0]).round(3))


if __name__ == "__main__":
    main()
