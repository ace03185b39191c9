"""Debug / numerical-safety tooling.

SURVEY.md §5 "race detection/sanitizers": the reference's only sanitizer was
the Vulkan validation layer that killed the process on any error
(VulkanHelper.cs:14-17,88-134). The JAX-native equivalents:

- `debug_mode()` — jax_debug_nans + disable_jit-style eager checks plus
  interpreter-mode Pallas kernels, so NaN/OOB surface at the faulting op
  with a Python traceback instead of corrupting downstream tensors;
- `checkify_forward()` — wraps a model forward with jax.experimental.checkify
  NaN/OOB checks that run *inside* jit and report structured errors.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True, interpret_kernels: bool = True):
    """Run a block with aggressive numerical checking (slow; for debugging)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    stack = contextlib.ExitStack()
    with stack:
        if nan_checks:
            prev = jax.config.read("jax_debug_nans")
            jax.config.update("jax_debug_nans", True)
            stack.callback(lambda: jax.config.update("jax_debug_nans", prev))
        if interpret_kernels:
            stack.enter_context(pltpu.force_tpu_interpret_mode())
        yield


def checkify_forward(fn):
    """Wrap a jittable function with in-jit NaN/div/OOB checks.

    Returns `checked(*args) -> (error, out)`; call `error.throw()` to raise
    on failure (works inside jit, unlike jax_debug_nans).
    """
    from jax.experimental import checkify

    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )
