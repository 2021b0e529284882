"""A/B: exact-erf vs tanh-approx GELU inside the GEGLU feed-forward.

The reference's FFN (diffusers GEGLU, torch F.gelu default) is exact erf;
this measures what the erf costs on the v5e VPU at the SD 64x64 shape and
what the tanh approximation (|rel err| ~1e-3, below bf16 compute noise)
buys. Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_gelu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from sketch2img_tpu.utils.profiling import device_timeit  # noqa: E402


class FF(nn.Module):
    dim: int
    approx: bool

    @nn.compact
    def __call__(self, x):
        inner = self.dim * 4
        h = nn.Dense(inner * 2, dtype=jnp.bfloat16, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=self.approx)
        return nn.Dense(self.dim, dtype=jnp.bfloat16, name="proj_out")(h)


def main():
    for b, n, dim in [(2, 4096, 320), (16, 4096, 320), (2, 1024, 640)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, dim), jnp.bfloat16)
        for approx in (False, True):
            ff = FF(dim, approx)
            v = ff.init(jax.random.PRNGKey(1), x)
            f = jax.jit(lambda v, x: ff.apply(v, x))
            dt = device_timeit(f, v, x, iters=50)
            print(f"({b},{n},{dim}) approx={approx}: {dt*1e6:9.1f}us",
                  flush=True)


if __name__ == "__main__":
    main()
