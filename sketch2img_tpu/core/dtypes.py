"""Explicit dtype policy (replaces torch AMP autocast).

The reference scatters dtype decisions across call sites
(/root/reference/trainer.py:149-153: unet/text fp16, vae/sketch-GAN/LGP fp32;
/root/reference/app.py:30,69: everything fp16 at inference). On TPU the right
mixed-precision story is bf16 compute on the MXU with fp32 params/reductions,
stated once as a policy object and threaded to every model.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy for a model: parameter storage / compute / output."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


# Inference: bf16 everywhere the MXU touches, fp32 outputs.
INFERENCE = Policy()

# Training parity with the reference's placement (trainer.py:149-153):
# frozen UNet/text run in bf16, trainable LGP + VAE in fp32.
TRAIN_FROZEN = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
TRAIN_EXACT = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
