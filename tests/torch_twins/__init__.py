r"""Hand-built PyTorch twins of diffusers-architecture backbones.

These are *test oracles*: independent PyTorch implementations of the
checkpoint architectures (diffusers `UNet2DConditionModel`, `AutoencoderKL`,
Flux `MMDiT`, ...), written to produce state dicts with the exact checkpoint
key names. Parity tests initialize a twin with random weights, convert its
state dict through the production converter, and compare forwards — the same
golden-random-weights protocol as `tests/test_wrappers_parity.py`.

They are NOT part of the package and never run on TPU.
"""
