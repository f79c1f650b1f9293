"""Mixed-precision helpers.

TPU MXUs natively multiply bf16; params stay f32 (master copy), compute
casts to bf16 at apply time. Used by the serving/bench paths; training
defaults to f32 activations with XLA's default bf16 matmul passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast floating-point leaves of a pytree to ``dtype``."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def bf16_apply(apply_fn, params, *args, **kwargs):
    """Run ``apply_fn`` with bf16 params/inputs, return f32 outputs."""
    params16 = cast_floats(params, jnp.bfloat16)
    args16 = cast_floats(args, jnp.bfloat16)
    out = apply_fn(params16, *args16, **kwargs)
    return cast_floats(out, jnp.float32)
