"""TGTC — a TPU-native framework for texture-consistent 3D scene style transfer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
"TGTC-Style" reference (transformer-guided NeRF style transfer):

* LLFF scene loading, ray generation, NDC projection (`tgtc.data`)
* Volume-rendering math: stratified + hierarchical sampling, alpha
  compositing, positional encoding (`tgtc.ops`)
* NeRF trunk + 3D style field (style MLPs, variational latents), VAE,
  VGG/AdaIN/StyTr2 2D stylization stack (`tgtc.models`)
* Device-mesh parallelism over rays via jax.sharding (`tgtc.parallel`)
* Phase trainers/renderers + checkpointing + CLI (`tgtc.train`, `tgtc.cli`)

Everything under a jitted step is pure-functional: explicit PRNG keys,
pytree parameters, optax optimizers, orbax checkpoints.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (avoids importing jax at package import)
    if name == "Config":
        from tgtc.config import Config
        return Config
    if name == "load_config":
        from tgtc.config import load_config
        return load_config
    if name == "Pipeline":
        from tgtc.train.pipeline import Pipeline
        return Pipeline
    if name == "load_llff_data":
        from tgtc.data.llff import load_llff_data
        return load_llff_data
    raise AttributeError(f"module 'tgtc' has no attribute {name!r}")
