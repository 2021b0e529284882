"""sketch2img_tpu — TPU-native sketch-conditioned image generation.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
Mikubill/sketch2img (sketch-guided Stable Diffusion without retraining):

* ``models``    — Flax SD1.x components (UNet with functional activation taps,
                  VAE, CLIP text/vision, the Latent Edge Predictor MLP, the
                  anime2sketch edge-extractor GAN, attention-injection UNet).
* ``core``      — pure-function noise schedulers (DDIM, DPM-Solver++ 2M),
                  dtype policy, PRNG helpers, torch<->Flax weight converters.
* ``ops``       — Pallas TPU kernels (flash attention, fused GroupNorm+SiLU)
                  with pure-XLA fallbacks for CPU-mesh testing.
* ``parallel``  — device-mesh / sharding utilities (pjit-based data parallel
                  with room for a model axis).
* ``pipelines`` — jit-compiled sampling loops: plain text2img, LGP
                  sketch-guided (gradient guidance via jax.vjp), and
                  attention-injection conditioning.
* ``train``     — pjit train steps for the LGP and the injected-attention
                  stack, optax optimizers/schedules, orbax checkpointing.
* ``data``      — ImageStore dataset with danbooru/yandere tag processing.
* ``apps``      — demo / evaluation entry points mirroring the reference CLI.
"""

__version__ = "0.3.0"
