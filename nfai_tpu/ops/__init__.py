"""Compute ops: jnp reference implementations + Pallas TPU kernels."""
from .attention import causal_prefill_attention, decode_attention  # noqa: F401
from .norms import rms_norm  # noqa: F401
from .rope import apply_rope, compute_inv_freq  # noqa: F401
from .sampling import greedy_sample, sample_logits  # noqa: F401
