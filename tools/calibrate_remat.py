"""Measure guided-pipeline HBM needs via XLA's AOT memory analysis.

    python tools/calibrate_remat.py [--steps 2] [--cases ...]

For each (size, batch, remat) case, AOT-lowers and compiles the full
sketch-guided sampling fn (pipelines/sketch_guided.py) for the attached
TPU and prints one JSON line with XLA's own memory accounting
(``compiled.memory_analysis()``: argument/output/temp/generated-code
bytes). No step is executed — compile-only, so OOM cases are measurable.

The resulting table calibrates ``core/memory.py``'s auto-remat policy
(VERDICT r2 item 10): serving flips UNetConfig.remat per (batch, H, W)
instead of a manual --remat flag. fori_loop bodies compile once
regardless of trip count, so --steps 2 gives the same temp accounting as
50 steps (the sampling carries are steps-independent).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_CASES = [
    # (size_px, batch, remat)
    (512, 1, False),
    (512, 8, False),
    (768, 4, False),
    (1024, 1, False),
    (1024, 2, False),
    (768, 4, True),
    (1024, 2, True),
    (1024, 4, True),
]


def fit(path):
    """Read the JSON lines a calibration run printed and emit the
    (base, slope) constants for sketch2img_tpu/core/memory.py."""
    from sketch2img_tpu.core.memory import fit_from_calibration

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if "total_gib" in d:
                rows.append((d["size"], d["batch"], d["remat"], d["total_gib"]))
    bases, slopes = fit_from_calibration(rows)
    print(f"_BASE_GIB = {{False: {bases.get(False, 0):.2f}, "
          f"True: {bases.get(True, 0):.2f}}}")
    print(f"_SLOPE_GIB_PER_MPIX = {{False: {slopes.get(False, 0):.1f}, "
          f"True: {slopes.get(True, 0):.1f}}}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--cases", default=None,
                    help="comma list of SIZExBATCHxREMAT, e.g. 512x1x0,1024x2x1")
    ap.add_argument("--fit", default=None, metavar="LOG",
                    help="fit (base, slope) constants from a prior run's "
                         "JSON-lines log instead of compiling")
    args = ap.parse_args()
    if args.fit:
        fit(args.fit)
        return

    import dataclasses

    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.lgp import LatentEdgePredictor, lgp_fused_apply
    from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition
    from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn
    from sketch2img_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    cases = DEFAULT_CASES
    if args.cases:
        cases = []
        for part in args.cases.split(","):
            s, b, r = part.split("x")
            cases.append((int(s), int(b), bool(int(r))))

    sched = make_schedule()
    lgp = LatentEdgePredictor(compute_dtype=jnp.bfloat16)

    def build(remat):
        cfg = dataclasses.replace(SD15_CONFIG, remat=remat)
        unet = UNet2DCondition(cfg, compute_dtype=jnp.bfloat16)
        return unet

    # zeros params via eval_shape: compile-only, values never materialize
    def shapes_only(module, *a, **kw):
        sh = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *a, **kw))
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), sh)

    unet0 = build(False)
    up_sh = shapes_only(unet0, jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 77, 768)))["params"]
    lv_sh = shapes_only(lgp, jnp.zeros((1, 8, 8, 9280)),
                        jnp.zeros((1, 8, 8, 4)))

    for size, batch, remat in cases:
        unet = build(remat)
        fn = make_sketch_guided_fn(
            lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
            lambda p, x, t, c: unet.apply({"params": p}, x, t, c,
                                          capture_taps=True),
            lambda v, f, n: lgp.apply(v, f, n, train=False),
            sched, args.steps,
            lgp_apply_fused=lambda v, taps, nl, hh, ww: lgp_fused_apply(
                v, taps, nl, hh, ww, compute_dtype=jnp.bfloat16),
        )
        hw = size // 8
        arg_sh = (
            up_sh, lv_sh,
            jax.ShapeDtypeStruct((batch, hw, hw, 4), jnp.float32),
            jax.ShapeDtypeStruct((batch, 77, 768), jnp.float32),
            jax.ShapeDtypeStruct((batch, 77, 768), jnp.float32),
            jax.ShapeDtypeStruct((batch, hw, hw, 4), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        t0 = time.time()
        try:
            compiled = jax.jit(fn).lower(*arg_sh).compile()
            ma = compiled.memory_analysis()
            out = {
                "size": size, "batch": batch, "remat": remat,
                "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
                "args_gib": round(ma.argument_size_in_bytes / 2**30, 3),
                "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
                "alias_gib": round(getattr(ma, "alias_size_in_bytes", 0) / 2**30, 3),
                "total_gib": round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                     + ma.output_size_in_bytes) / 2**30, 3),
                "compile_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # surface per-case compile failures, keep going
            out = {"size": size, "batch": batch, "remat": remat,
                   "error": f"{type(e).__name__}: {e}"[:300],
                   "compile_s": round(time.time() - t0, 1)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
