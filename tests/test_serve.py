"""HTTP serving app end-to-end on the tiny stack: healthz, PNG and JSON
generation, sketch conditioning, error handling."""

import base64
import http.client
import io
import json
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.apps.serve import make_server, warmup
from sketch2img_tpu.models.clip_text import CLIPTextConfig
from sketch2img_tpu.models.lgp import LatentEdgePredictor
from sketch2img_tpu.models.unet import UNetConfig
from sketch2img_tpu.models.vae import VAEConfig
from sketch2img_tpu.runtime import SDComponents, SketchGuidedPipeline

from fakes import FakeTokenizer

TAP_CH = 480


@pytest.fixture(scope="module")
def server():
    c = SDComponents.random_init(
        compute_dtype=jnp.float32,
        unet_config=UNetConfig(block_out_channels=(32, 32, 64, 64),
                               cross_attn=(True, True, True, False),
                               num_heads=2, cross_attention_dim=32),
        vae_config=VAEConfig(block_out_channels=(32, 64)),
        text_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_layers=2,
                                   num_heads=4),
        random_weights=True,
    )
    c.tokenizer = FakeTokenizer()
    lgp = LatentEdgePredictor(input_dim=TAP_CH + 4 + 36, output_dim=4,
                              num_layers=9)
    c.lgp = lgp
    c.lgp_vars = lgp.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 4, 4, TAP_CH)), jnp.zeros((1, 4, 4, 4)),
                          train=False)
    from sketch2img_tpu.apps.clip_guided_inf import ClipGuidedPipeline
    from sketch2img_tpu.models.clip_vision import CLIPVisionConfig

    inject_pipe = ClipGuidedPipeline(
        components=c, cast_bf16=False,
        clip_config=CLIPVisionConfig(image_size=28, patch_size=14,
                                     hidden_size=32, num_layers=2,
                                     num_heads=4, intermediate_size=64))
    srv = make_server(SketchGuidedPipeline(c), "127.0.0.1", 0,
                      inject_pipe=inject_pipe)
    warmup(srv, [(128, 128, 2)])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.server_port,
                                      timeout=600)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def test_healthz_reports_warm(server):
    resp, data = _request(server, "GET", "/healthz")
    assert resp.status == 200
    assert json.loads(data) == {"status": "ok", "warm": True}


def test_generate_png(server):
    resp, data = _request(server, "POST", "/generate", {
        "prompt": "a cat", "num_inference_steps": 2,
        "width": 128, "height": 128, "seed": 5,
    })
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "image/png"
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(data)))
    assert img.shape == (128, 128, 3)


def test_generate_json_with_sketch_and_batch(server):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((128, 128), 255, np.uint8)).save(buf, format="PNG")
    resp, data = _request(server, "POST", "/generate", {
        "prompt": ["a cat", "a dog"], "num_inference_steps": 3,
        "width": 128, "height": 128, "seed": 7, "response": "json",
        "sketch_png_b64": base64.b64encode(buf.getvalue()).decode(),
    })
    assert resp.status == 200
    out = json.loads(data)
    assert len(out["images"]) == 2
    png0 = base64.b64decode(out["images"][0])
    assert png0[:8] == b"\x89PNG\r\n\x1a\n"


def test_generate_inject_route(server):
    """mode=inject routes to the CLIP attention-injection pipeline
    (reference demo modules/clip_guided_inf.py) — deterministic per seed,
    and the sketch + strength actually condition the result."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((64, 64), 255, np.uint8)).save(buf, format="PNG")
    body = {
        "prompt": "a cat", "mode": "inject", "num_inference_steps": 2,
        "width": 128, "height": 128, "seed": 5, "strength": 0.7,
        "sketch_png_b64": base64.b64encode(buf.getvalue()).decode(),
    }
    resp, data = _request(server, "POST", "/generate", body)
    assert resp.status == 200
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    img = np.asarray(Image.open(io.BytesIO(data)))
    assert img.shape == (128, 128, 3)

    resp2, data2 = _request(server, "POST", "/generate", body)
    assert data2 == data  # same seed -> same image

    resp3, data3 = _request(server, "POST", "/generate",
                            {**body, "strength": 0.0})
    assert resp3.status == 200
    assert data3 != data  # injection strength conditions the output

    # no sketch: plain CFG sampling through the injected UNet (zero state)
    resp4, data4 = _request(server, "POST", "/generate",
                            {k: v for k, v in body.items()
                             if k != "sketch_png_b64"})
    assert resp4.status == 200

    # prompt lists + per-image seed AND strength lists (round-5: the
    # inject route has the same serving surface as the main route)
    resp5, data5 = _request(server, "POST", "/generate",
                            {**body, "prompt": ["a", "b"], "seed": [1, 2],
                             "strength": [0.3, 0.9], "response": "json"})
    assert resp5.status == 200
    assert len(json.loads(data5)["images"]) == 2

    # mismatched lengths stay client errors, not 500s
    resp6, data6 = _request(server, "POST", "/generate",
                            {**body, "prompt": ["a", "b"], "seed": [1]})
    assert resp6.status == 400
    assert "seeds" in json.loads(data6)["error"]
    resp7, data7 = _request(server, "POST", "/generate",
                            {**body, "strength": [0.1, 0.2]})
    assert resp7.status == 400
    assert "strengths" in json.loads(data7)["error"]


def test_inject_scalar_seed_batch_draws_distinct_noise(server):
    """A prompt list with ONE scalar seed must draw distinct per-image
    initial noise from the single generator (the main pipeline's
    one-generator surface, runtime._init_one_seed) — not replicate the
    seed per image, which would return duplicate images for duplicate
    prompts."""
    inj = server.handler_class.inject_pipe
    imgs = inj(["a cat", "a cat"], num_inference_steps=2,
               width=128, height=128, seed=5)
    assert imgs.shape == (2, 128, 128, 3)
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-3


def test_inject_route_requires_weights(server):
    """A server started without injection weights rejects mode=inject
    with a client error, not a crash."""
    plain = make_server(server.handler_class.pipe, "127.0.0.1", 0)
    t = threading.Thread(target=plain.serve_forever, daemon=True)
    t.start()
    try:
        resp, data = _request(plain, "POST", "/generate",
                              {"prompt": "x", "mode": "inject"})
        assert resp.status == 400
        assert "not enabled" in json.loads(data)["error"]
    finally:
        plain.shutdown()


def test_bad_request_and_unknown_path(server):
    resp, _ = _request(server, "POST", "/generate", {"steps": 2})
    assert resp.status == 400
    resp, _ = _request(server, "GET", "/nope")
    assert resp.status == 404


def test_micro_batching_merges_concurrent_requests(server):
    """Two compatible concurrent requests must be served by ONE pipeline
    call, and each response must equal the single-request result for its
    seed (per-image-seed batch invariance)."""
    from sketch2img_tpu.apps.serve import make_server, warmup

    pipe = server.handler_class.pipe
    bsrv = make_server(pipe, "127.0.0.1", 0, batch_window_ms=1500,
                       max_batch=2)
    warmup(bsrv, [(128, 128, 2)])
    t = threading.Thread(target=bsrv.serve_forever, daemon=True)
    t.start()
    try:
        results = {}

        def fire(name, seed):
            resp, data = _request(bsrv, "POST", "/generate", {
                "prompt": f"a {name}", "num_inference_steps": 2,
                "width": 128, "height": 128, "seed": seed,
                "response": "json",
            })
            results[name] = (resp.status, json.loads(data))

        calls_before = bsrv.handler_class.batcher.calls
        t1 = threading.Thread(target=fire, args=("cat", 101))
        t2 = threading.Thread(target=fire, args=("dog", 202))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert results["cat"][0] == 200 and results["dog"][0] == 200
        assert bsrv.handler_class.batcher.calls == calls_before + 1

        # batch invariance: the batched "dog" image equals a direct
        # single-image call with the same seed
        solo = pipe(["a dog"], num_inference_steps=2, width=128, height=128,
                    seed=[202])
        import io as _io

        from PIL import Image

        got = np.asarray(Image.open(_io.BytesIO(
            base64.b64decode(results["dog"][1]["images"][0]))))
        want = (np.clip(np.asarray(solo[0]), 0, 1) * 255).astype(np.uint8)
        # the latent init is seed-exact, but XLA's bs2 program may round a
        # handful of pixels one step differently than bs1 (fusion order)
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, diff.max()
    finally:
        bsrv.shutdown()


class _FlakyPipe:
    """Wraps the real pipeline; raises on demand to simulate a device-side
    failure (an XlaRuntimeError mid-generation)."""

    def __init__(self, real):
        self.real = real
        self.fail_next = 0
        self.last_nsfw_flags = None

    def __call__(self, *a, **kw):
        if self.fail_next:
            self.fail_next -= 1
            raise RuntimeError("injected device fault")
        out = self.real(*a, **kw)
        self.last_nsfw_flags = self.real.last_nsfw_flags
        return out


def test_device_fault_releases_lock_and_recovers(server):
    """When a pipeline call raises mid-request (simulated device failure),
    the worker lock is released, /metrics counts the error, the batcher
    stays alive, and the NEXT request succeeds — no wedged lock, no stale
    batcher state (VERDICT r4 item 8). Covers the micro-batched, direct,
    and streaming paths."""
    pipe = _FlakyPipe(server.handler_class.pipe)
    bsrv = make_server(pipe, "127.0.0.1", 0, batch_window_ms=50, max_batch=2)
    warmup(bsrv, [(128, 128, 2)])
    t = threading.Thread(target=bsrv.serve_forever, daemon=True)
    t.start()
    h = bsrv.handler_class
    body = {"prompt": "a cat", "num_inference_steps": 2,
            "width": 128, "height": 128, "seed": 5}
    try:
        # --- micro-batched path ---
        pipe.fail_next = 1
        resp, data = _request(bsrv, "POST", "/generate", body)
        assert resp.status == 500
        assert "injected device fault" in json.loads(data)["error"]
        assert h.lock.acquire(blocking=False), "worker lock wedged"
        h.lock.release()
        resp, _ = _request(bsrv, "POST", "/generate", body)  # batcher alive
        assert resp.status == 200

        # --- direct (non-batchable) path ---
        pipe.fail_next = 1
        resp, data = _request(bsrv, "POST", "/generate",
                              {**body, "num_images_per_prompt": 2})
        assert resp.status == 500
        assert h.lock.acquire(blocking=False), "worker lock wedged"
        h.lock.release()

        # --- streaming path: headers already sent -> event: error ---
        pipe.fail_next = 1
        conn = http.client.HTTPConnection("127.0.0.1", bsrv.server_port,
                                          timeout=600)
        conn.request("POST", "/generate",
                     body=json.dumps({**body, "stream": True}))
        resp = conn.getresponse()
        assert resp.status == 200  # SSE stream opened before the fault
        raw = resp.read().decode()
        conn.close()
        assert "event: error" in raw
        assert "injected device fault" in raw
        assert h.lock.acquire(blocking=False), "worker lock wedged"
        h.lock.release()

        # server still healthy: errors counted, nothing pending, next ok
        resp, data = _request(bsrv, "GET", "/metrics")
        m = json.loads(data)
        assert m["errors"] >= 3 and m["pending"] == 0
        resp, _ = _request(bsrv, "POST", "/generate", body)
        assert resp.status == 200
    finally:
        bsrv.shutdown()


def test_metrics_endpoint(server):
    """Generation metrics accumulate (runs after the generation tests)."""
    resp, data = _request(server, "GET", "/metrics")
    assert resp.status == 200
    m = json.loads(data)
    assert m["requests"] >= 2
    assert m["images"] >= 3  # single PNG + the batch of 2
    assert m["errors"] == 0
    assert m["latency_p50_s"] > 0


def test_micro_batching_merges_different_sketches(server):
    """Requests with DIFFERENT sketches merge into one pipeline call — the
    pipeline takes one sketch per batch image — and each response equals a
    solo run with the same (seed, sketch): nothing leaks across requests."""
    import io as _io

    from PIL import Image

    from sketch2img_tpu.apps.serve import make_server, warmup

    pipe = server.handler_class.pipe
    bsrv = make_server(pipe, "127.0.0.1", 0, batch_window_ms=1500,
                       max_batch=2)
    warmup(bsrv, [(128, 128, 2)])
    t = threading.Thread(target=bsrv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(0)
        sketches = {name: rng.integers(0, 256, (128, 128),
                                       dtype=np.uint8).astype(np.uint8)
                    for name in ("cat", "dog")}

        def sketch_b64(arr):
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        results = {}

        def fire(name, seed):
            resp, data = _request(bsrv, "POST", "/generate", {
                "prompt": f"a {name}", "num_inference_steps": 2,
                "width": 128, "height": 128, "seed": seed,
                "sketch_png_b64": sketch_b64(sketches[name]),
                "response": "json",
            })
            results[name] = (resp.status, json.loads(data))

        calls0 = bsrv.handler_class.batcher.calls
        t1 = threading.Thread(target=fire, args=("cat", 11))
        t2 = threading.Thread(target=fire, args=("dog", 22))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert results["cat"][0] == 200 and results["dog"][0] == 200
        # different sketches now merge: ONE pipeline call
        assert bsrv.handler_class.batcher.calls == calls0 + 1

        # per-request isolation: each batched image equals the solo run
        # with its own (seed, sketch)
        for name, seed in (("cat", 11), ("dog", 22)):
            solo = pipe([f"a {name}"], num_inference_steps=2,
                        width=128, height=128, seed=[seed],
                        sketch_image=[sketches[name].astype(np.float32) / 255.0])
            got = np.asarray(Image.open(_io.BytesIO(
                base64.b64decode(results[name][1]["images"][0]))))
            want = (np.clip(np.asarray(solo[0]), 0, 1) * 255).astype(np.uint8)
            diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
            # seed/sketch-exact; bs2 vs bs1 XLA programs may round a few
            # pixels one step apart (fusion order)
            assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, (
                name, diff.max(), (diff > 0).mean())
    finally:
        bsrv.shutdown()


def test_streaming_progress_events(server):
    """``stream: true`` returns Server-Sent Events: ordered progress
    events during sampling (the pipeline's reference-parity callback,
    modules/pipeline.py:34-35), then one result event whose image matches
    the non-streamed run."""
    conn = http.client.HTTPConnection("127.0.0.1", server.server_port,
                                      timeout=600)
    body = {"prompt": "a cat", "num_inference_steps": 4, "width": 128,
            "height": 128, "seed": 5, "stream": True, "progress_every": 1}
    conn.request("POST", "/generate", body=json.dumps(body))
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()
    conn.close()

    events = []
    for block in raw.strip().split("\n\n"):
        lines = dict(ln.split(": ", 1) for ln in block.split("\n"))
        events.append((lines["event"], json.loads(lines["data"])))
    kinds = [k for k, _ in events]
    assert kinds[-1] == "result"
    assert kinds.count("progress") >= 2
    steps = [e["step"] for k, e in events if k == "progress"]
    assert steps == sorted(steps) and steps[0] >= 1 and max(steps) <= 4

    png = base64.b64decode(events[-1][1]["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # ... and matches the plain run (the callback variant is a different
    # XLA program; allow one uint8 rounding step)
    resp2, data2 = _request(server, "POST", "/generate",
                            {k: v for k, v in body.items()
                             if k not in ("stream", "progress_every")})
    assert resp2.status == 200
    from PIL import Image

    a = np.asarray(Image.open(io.BytesIO(png)), np.int16)
    b = np.asarray(Image.open(io.BytesIO(data2)), np.int16)
    assert np.abs(a - b).max() <= 1

    # streaming is a per-request surface: not available for mode=inject
    resp3, data3 = _request(server, "POST", "/generate",
                            {**body, "mode": "inject"})
    assert resp3.status == 400
    assert "stream" in json.loads(data3)["error"]


def test_streaming_latent_previews(server):
    """``preview: true`` attaches latent->RGB thumbnails (one per image,
    latent resolution) to each progress event — decodable PNGs, no extra
    device programs (the projection is host-side on the callback fetch)."""
    from PIL import Image

    conn = http.client.HTTPConnection("127.0.0.1", server.server_port,
                                      timeout=600)
    body = {"prompt": "a cat", "num_inference_steps": 3, "width": 128,
            "height": 128, "seed": 5, "stream": True, "progress_every": 1,
            "preview": True, "num_images_per_prompt": 2}
    conn.request("POST", "/generate", body=json.dumps(body))
    resp = conn.getresponse()
    assert resp.status == 200
    raw = resp.read().decode()
    conn.close()

    got = 0
    for block in raw.strip().split("\n\n"):
        lines = dict(ln.split(": ", 1) for ln in block.split("\n"))
        if lines["event"] != "progress":
            continue
        payload = json.loads(lines["data"])
        assert len(payload["previews"]) == 2  # one per image
        f = server.handler_class.pipe.c.vae_scale_factor
        for b64 in payload["previews"]:
            im = Image.open(io.BytesIO(base64.b64decode(b64)))
            assert im.size == (128 // f, 128 // f)
        got += 1
    assert got >= 2


def test_warmup_compiles_per_image_sketch_programs(server):
    """With micro-batching on, warmup must exercise the batcher's ACTUAL
    batched-sketch program — a LIST of per-image sketches for every batch
    size > 1 — so the first merged different-sketch batch doesn't
    cold-compile while holding the device lock (ADVICE r3)."""
    real = server.handler_class.pipe
    calls = []

    class Recorder:
        last_nsfw_flags = None

        def __call__(self, prompts, **kw):
            sk = kw.get("sketch_image")
            calls.append((len(prompts),
                          len(sk) if isinstance(sk, list) else
                          ("array" if sk is not None else None)))
            out = real(prompts, **kw)
            self.last_nsfw_flags = real.last_nsfw_flags
            return out

    bsrv = make_server(Recorder(), "127.0.0.1", 0, batch_window_ms=50,
                       max_batch=2)
    warmup(bsrv, [(128, 128, 2)])
    # every batch size up to max_batch, text2img + sketch variants; the
    # b=2 sketch warmup must be a per-image LIST of 2 sketches (the
    # program the batcher runs for merged different-sketch requests)
    assert (1, None) in calls and (2, None) in calls
    assert (2, 2) in calls


def test_micro_batching_merges_inject_requests(server):
    """Two concurrent mode=inject requests with DIFFERENT sketches and
    DIFFERENT strengths merge into ONE injected-pipeline call, and each
    response equals the solo run with its own (seed, sketch, strength) —
    the round-5 contract that makes the injection route a first-class
    citizen of the serving stack."""
    import io as _io

    from PIL import Image

    from sketch2img_tpu.apps.serve import make_server, warmup

    h = server.handler_class
    bsrv = make_server(h.pipe, "127.0.0.1", 0, batch_window_ms=1500,
                       max_batch=2, inject_pipe=h.inject_pipe)
    warmup(bsrv, [(128, 128, 2)])
    t = threading.Thread(target=bsrv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(1)
        cases = {"cat": (31, 0.3), "dog": (32, 0.9)}
        sketches = {name: rng.integers(0, 256, (64, 64),
                                       dtype=np.uint8)
                    for name in cases}

        def sketch_b64(arr):
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        results = {}

        def fire(name):
            seed, strength = cases[name]
            resp, data = _request(bsrv, "POST", "/generate", {
                "prompt": f"a {name}", "mode": "inject",
                "num_inference_steps": 2, "width": 128, "height": 128,
                "seed": seed, "strength": strength,
                "sketch_png_b64": sketch_b64(sketches[name]),
                "response": "json",
            })
            results[name] = (resp.status, json.loads(data))

        calls0 = bsrv.handler_class.batcher.calls
        t1 = threading.Thread(target=fire, args=("cat",))
        t2 = threading.Thread(target=fire, args=("dog",))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert results["cat"][0] == 200 and results["dog"][0] == 200
        assert bsrv.handler_class.batcher.calls == calls0 + 1  # merged

        # per-request isolation: each batched image equals the solo run
        # with its own (seed, sketch, strength)
        for name in cases:
            seed, strength = cases[name]
            solo = h.inject_pipe(
                f"a {name}", num_inference_steps=2, width=128, height=128,
                seed=seed, strength=strength,
                spimg=sketches[name].astype(np.float32) / 255.0)
            got = np.asarray(Image.open(_io.BytesIO(
                base64.b64decode(results[name][1]["images"][0]))))
            want = (np.clip(np.asarray(solo), 0, 1) * 255).astype(np.uint8)
            diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
            # seed/sketch/strength-exact; bs2 vs bs1 XLA programs may
            # round a few pixels one step apart (fusion order)
            assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, (
                name, diff.max(), (diff > 0).mean())
    finally:
        bsrv.shutdown()


def test_load_shedding_503(server):
    """Beyond max_pending admitted requests the server sheds with 503 +
    Retry-After instead of queueing unbounded multi-second device work."""
    h = server.handler_class
    old = h.state["max_pending"]
    h.state["max_pending"] = 0  # everything sheds
    try:
        resp, data = _request(server, "POST", "/generate", {
            "prompt": "a cat", "num_inference_steps": 2,
            "width": 128, "height": 128,
        })
        assert resp.status == 503
        assert resp.getheader("Retry-After") is not None
        assert "overloaded" in json.loads(data)["error"]
    finally:
        h.state["max_pending"] = old

    resp, data = _request(server, "GET", "/metrics")
    m = json.loads(data)
    assert m["shed"] >= 1 and m["pending"] == 0

    # back under the cap, the same request serves fine
    resp, _ = _request(server, "POST", "/generate", {
        "prompt": "a cat", "num_inference_steps": 2,
        "width": 128, "height": 128,
    })
    assert resp.status == 200


def test_request_timeout_504(server):
    """A request stuck waiting for the device past request_timeout_s gets a
    504; the server keeps serving once the device frees up."""
    h = server.handler_class
    old = h.state["request_timeout_s"]
    h.state["request_timeout_s"] = 0.2
    h.lock.acquire()  # simulate a long generation holding the chip
    try:
        resp, data = _request(server, "POST", "/generate", {
            "prompt": "a cat", "num_inference_steps": 2,
            "width": 128, "height": 128,
        })
        assert resp.status == 504
        assert "timeout" in json.loads(data)["error"]
    finally:
        h.lock.release()
        h.state["request_timeout_s"] = old

    resp, data = _request(server, "GET", "/metrics")
    assert json.loads(data)["timeouts"] >= 1

    resp, _ = _request(server, "POST", "/generate", {
        "prompt": "a cat", "num_inference_steps": 2,
        "width": 128, "height": 128,
    })
    assert resp.status == 200


def test_batched_queue_timeout_abandons_item(server):
    """A micro-batched request that times out while queued is dropped by
    the batcher worker — no device work runs for a client that already got
    its 504."""
    from sketch2img_tpu.apps.serve import make_server, warmup

    pipe = server.handler_class.pipe
    bsrv = make_server(pipe, "127.0.0.1", 0, batch_window_ms=50,
                       max_batch=2, request_timeout_s=0.2)
    warmup(bsrv, [(128, 128, 2)])
    t = threading.Thread(target=bsrv.serve_forever, daemon=True)
    t.start()
    h = bsrv.handler_class
    h.lock.acquire()  # batcher worker can't start any pipeline call
    try:
        calls0 = h.batcher.calls
        resp, data = _request(bsrv, "POST", "/generate", {
            "prompt": "a cat", "num_inference_steps": 2,
            "width": 128, "height": 128, "seed": 7,
        })
        assert resp.status == 504
    finally:
        h.lock.release()
    try:
        # give the worker a moment: it must DROP the abandoned item, not
        # run a batch for it
        time_limit = time.monotonic() + 2.0
        while time.monotonic() < time_limit and not h.batcher.q.empty():
            time.sleep(0.05)
        # wait for the 50 ms window sweep to drain the abandoned item
        time.sleep(0.3)
        assert h.batcher.calls == calls0

        # the batched path still works afterwards
        resp, _ = _request(bsrv, "POST", "/generate", {
            "prompt": "a cat", "num_inference_steps": 2,
            "width": 128, "height": 128, "seed": 8,
        })
        assert resp.status == 200
    finally:
        bsrv.shutdown()
