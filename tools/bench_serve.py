"""End-to-end HTTP serving load test on the real chip.

Drives `apps/serve.py` the way a deployment would — concurrent HTTP
clients, PNG sketches, per-request seeds — and reports served
images/sec + latency percentiles, with and without cross-request
micro-batching, from ONE process (cross-process tunnel-latency drift
makes separate runs incomparable, CLAUDE.md). Random full-size SD1.5
weights: serving *throughput* only, like bench.py.

The reference has no serving surface to compare against (its only entry
is the gradio demo, /root/reference/app.py:127-227); this quantifies the
micro-batcher's value on v5e: how much cheaper a served image gets when
compatible concurrent requests merge into one pipeline call.

Usage (from the repo root):
  python tools/bench_serve.py --steps 50 --size 512 --clients 4 \
      --requests 2 --max_batch 2 [--windows 0,50]

Output: one JSON line per window setting, e.g.
  {"metric": "serve_512px_50step_window50ms_images_per_sec", ...}
"""

from __future__ import annotations

import argparse
import base64
import http.client
import io
import json
import threading
import time

import numpy as np


class _Tok:
    """Deterministic stand-in tokenizer (random-weight throughput bench;
    the real server loads the native BPE from the checkpoint's tokenizer/
    assets, data/tokenizer.py)."""

    pad_token_id = 9

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, prompt, padding=None, truncation=None, max_length=77):
        def enc(text):
            ids = [ord(c) % 90 for c in text][:max_length]
            return ids + [self.pad_token_id] * (max_length - len(ids))

        if isinstance(prompt, str):
            return self._Out(enc(prompt))
        return self._Out([enc(t) for t in prompt])


def _build_pipe():
    import jax
    import jax.numpy as jnp

    import bench
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.runtime import SDComponents, SketchGuidedPipeline

    # zero VAE/text params (their cost is shape-bound, values irrelevant);
    # random UNet + LGP so the guidance vjp is non-degenerate (zero grads
    # would divide the guidance norm by zero)
    c = SDComponents.random_init(compute_dtype=jnp.bfloat16)
    c.unet_params = bench._serving_cast(
        bench._random_init(c.unet, jnp.zeros((1, 8, 8, 4)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 77, 768)))["params"])
    lgp = LatentEdgePredictor(compute_dtype=jnp.bfloat16)
    lv = bench._random_init(lgp, jnp.zeros((1, 64, 64, 9280)),
                            jnp.zeros((1, 64, 64, 4)))
    lv["batch_stats"] = jax.tree_util.tree_map(
        lambda x: jnp.abs(x) + 0.5, lv["batch_stats"])
    c.lgp, c.lgp_vars = lgp, lv  # serving keeps the LGP fp32 (edge parity)
    c.tokenizer = _Tok()
    return SketchGuidedPipeline(c)


def _sketch_b64(seed: int, size: int) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (size, size), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _drive(port: int, *, clients: int, requests: int, steps: int,
           size: int) -> tuple[float, list]:
    """Fire clients*requests sketch generations; -> (wall_s, latencies)."""
    lats: list = []
    lock = threading.Lock()

    def client(ci: int):
        sk = _sketch_b64(ci, size)
        for ri in range(requests):
            body = json.dumps({
                "prompt": f"a cat {ci}", "num_inference_steps": steps,
                "width": size, "height": size, "seed": ci * 1000 + ri + 1,
                "sketch_png_b64": sk,
            })
            t0 = time.monotonic()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/generate", body=body)
            resp = conn.getresponse()
            data = resp.read()
            conn.close()
            assert resp.status == 200, (resp.status, data[:200])
            with lock:
                lats.append(time.monotonic() - t0)

    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.monotonic() - t0, sorted(lats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=2,
                    help="sequential requests per client")
    ap.add_argument("--max_batch", type=int, default=2)
    ap.add_argument("--windows", default="0,50",
                    help="comma list of batch_window_ms settings to compare")
    args = ap.parse_args()

    import bench
    from sketch2img_tpu.apps.serve import make_server, warmup

    bench._enable_compile_cache()
    pipe = _build_pipe()
    windows = [float(w) for w in args.windows.split(",")]
    results = []
    for window in windows:
        srv = make_server(pipe, "127.0.0.1", 0,
                          batch_window_ms=window, max_batch=args.max_batch,
                          max_pending=max(64, 2 * args.clients))
        warmup(srv, [(args.size, args.size, args.steps)], sketch=True)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            wall, lats = _drive(srv.server_port, clients=args.clients,
                                requests=args.requests, steps=args.steps,
                                size=args.size)
            n = args.clients * args.requests
            h = srv.handler_class
            calls = None if h.batcher is None else h.batcher.calls
            with h.state["metrics"]["lock"]:
                hist = dict(h.state["metrics"]["batch_sizes"])
            out = {
                "metric": (f"serve_{args.size}px_{args.steps}step_"
                           f"window{window:g}ms_images_per_sec"),
                "value": round(n / wall, 4),
                "unit": "images/sec",
                "latency_p50_s": round(lats[len(lats) // 2], 3),
                "latency_max_s": round(lats[-1], 3),
                "images": n,
                "pipeline_calls": calls,
                "batch_histogram": hist,
            }
            print(json.dumps(out), flush=True)
            results.append(out)
        finally:
            srv.shutdown()
    if len(results) == 2 and results[0]["value"] > 0:
        gain = results[1]["value"] / results[0]["value"] - 1
        print(json.dumps({"metric": "serve_microbatch_throughput_gain",
                          "value": round(gain, 4), "unit": "ratio"}),
              flush=True)


if __name__ == "__main__":
    main()
