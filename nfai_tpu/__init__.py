"""nfai_tpu — a TPU-native GGUF inference framework (JAX / XLA / Pallas).

A ground-up rebuild of the capability surface of NicuTheodorAlexandru/NFAI
(a Vulkan/C# GGUF chat engine) designed TPU-first: block-quantized GGUF
weights live in HBM and are dequantized inside fused Pallas matmul kernels;
decoding runs as a single jitted XLA program per step; scaling is expressed
with `jax.sharding` meshes rather than hand-written communication.
"""
__version__ = "0.1.0"
