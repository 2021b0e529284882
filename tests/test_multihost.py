"""True multi-process distributed smoke test.

The reference's distributed backend is torch DDP under accelerate
(/root/reference/trainer.py:91-98,144-146): N processes, rank identity from
the environment, gradient all-reduce.  The TPU-native replacement is
`jax.distributed.initialize` + a global (data, model) mesh
(parallel/mesh.py).  The in-process 8-device mesh used by the rest of the
suite exercises the shardings but not the cross-process path, so this test
launches TWO real processes (4 virtual CPU devices each), brings up the
coordinator, builds the 8-device global mesh, and runs a DP-sharded
gradient step — asserting both ranks hold identical replicated parameters
afterwards (the all-reduce semantics DDP provides).
"""

import socket
import subprocess
import sys
import textwrap

import numpy as np

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    from sketch2img_tpu.parallel import (
        batch_sharding, initialize_distributed, make_mesh, sync_global_devices,
    )
    initialize_distributed(coordinator_address=coord, num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.train.optim import make_optimizer

    mesh = make_mesh()  # (data=8, model=1) over the global devices
    lgp = LatentEdgePredictor(input_dim=48 + 4 + 36, output_dim=4, num_layers=9)
    variables = lgp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 48)),
                         jnp.zeros((1, 4, 4, 4)), train=True)
    tx = make_optimizer("adamw", 1e-3)
    opt_state = tx.init(variables["params"])

    rep = NamedSharding(mesh, P())
    variables = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            x.shape, rep, lambda idx: np.asarray(x)[idx]), variables)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), rep, lambda idx: np.asarray(x)[idx]), opt_state)

    # per-process local half of the global batch of 8 (deterministic, rank-keyed)
    feats = np.stack([np.full((4, 4, 48), 0.1 * (4 * pid + i), np.float32)
                      for i in range(4)])
    target = np.stack([np.full((4, 4, 4), 0.01 * (4 * pid + i), np.float32)
                       for i in range(4)])
    bs = batch_sharding(mesh, 4)
    feats = jax.make_array_from_process_local_data(bs, feats, (8, 4, 4, 48))
    target = jax.make_array_from_process_local_data(bs, target, (8, 4, 4, 4))

    @jax.jit
    def step(variables, opt_state, feats, target):
        def loss_fn(params):
            out, upd = lgp.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, target * 0.0, train=True, mutable=["batch_stats"])
            return jnp.mean((out - target) ** 2), upd
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return params, opt_state, loss

    params, opt_state, loss = step(variables, opt_state, feats, target)
    sync_global_devices("after-step")
    leaves = jax.tree_util.tree_leaves(params)
    checksum = float(np.sum([np.abs(np.asarray(
        l.addressable_shards[0].data)).sum() for l in leaves]))
    print(f"RESULT pid={pid} loss={float(loss):.6f} checksum={checksum:.6f}",
          flush=True)
""")


SERVE_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    from sketch2img_tpu.parallel import (
        initialize_distributed, make_mesh, sync_global_devices,
    )
    initialize_distributed(coordinator_address=coord, num_processes=2,
                           process_id=pid)
    assert jax.device_count() == 8, jax.device_count()

    import hashlib
    import numpy as np
    import jax.numpy as jnp
    from sketch2img_tpu.models.clip_text import CLIPTextConfig
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.models.unet import UNetConfig
    from sketch2img_tpu.models.vae import VAEConfig
    from sketch2img_tpu.runtime import SDComponents, SketchGuidedPipeline

    class Tok:  # minimal tokenizer (ids only shape-matter)
        def __call__(self, prompt, padding=None, truncation=None,
                     max_length=77):
            class R:
                pass

            def enc(t):
                ids = [ord(ch) % 90 for ch in t][:max_length]
                return ids + [9] * (max_length - len(ids))

            r = R()
            r.input_ids = (enc(prompt) if isinstance(prompt, str)
                           else [enc(t) for t in prompt])
            return r

    TAP = 480
    # deterministic init => identical weights on both processes (the
    # multihost serving recipe: every process loads the same checkpoint)
    c = SDComponents.random_init(
        compute_dtype=jnp.float32,
        unet_config=UNetConfig(block_out_channels=(32, 32, 64, 64),
                               cross_attn=(True, True, True, False),
                               num_heads=2, cross_attention_dim=32),
        vae_config=VAEConfig(block_out_channels=(32, 64)),
        text_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_layers=2,
                                   num_heads=4),
        random_weights=True)
    c.tokenizer = Tok()
    lgp = LatentEdgePredictor(input_dim=TAP + 4 + 36, output_dim=4,
                              num_layers=9)
    c.lgp = lgp
    c.lgp_vars = lgp.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, 4, TAP)),
                          jnp.zeros((1, 4, 4, 4)), train=False)

    mesh = make_mesh()  # (data=8, model=1) spanning BOTH processes
    pipe = SketchGuidedPipeline(c, mesh=mesh)
    rng = np.random.default_rng(0)
    sk = [rng.uniform(0, 1, (64, 64)).astype(np.float32) for _ in range(2)]
    imgs = pipe(["a cat", "a dog"], seed=[11, 22], sketch_image=sk,
                num_inference_steps=2, width=64, height=64)
    assert imgs.shape == (2, 64, 64, 3), imgs.shape
    assert np.isfinite(imgs).all()
    u8 = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    digest = hashlib.sha256(u8.tobytes()).hexdigest()
    sync_global_devices("after-serve")
    print(f"RESULT pid={pid} digest={digest} mean={float(imgs.mean()):.6f}",
          flush=True)
""")


def _run_two_process(tmp_path, worker_src, timeout=900):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(worker_src)

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out
    return outs


def test_two_process_mesh_serving(tmp_path):
    """Pipeline GENERATION over a process-spanning mesh (VERDICT r4
    item 4): two processes (4 virtual CPU devices each) build the 8-way
    global data mesh, run the PUBLIC SketchGuidedPipeline end-to-end
    (per-image seeds, padded 2 -> 8 batch, guided sampling + VAE decode
    SPMD, allgathered fetch) and must return the SAME image bytes — the
    docs/SCALING.md serving claim, proven at the process level the way the
    train step already is."""
    import re

    outs = _run_two_process(tmp_path, SERVE_WORKER)
    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d+) digest=([0-9a-f]+) "
                      r"mean=([-\d.einfa]+)", out)
        assert m, out
        results[int(m.group(1))] = (m.group(2), float(m.group(3)))
    assert set(results) == {0, 1}, results
    (d0, m0), (d1, m1) = results[0], results[1]
    assert np.isfinite(m0)
    assert d0 == d1, results  # identical image bytes on both processes


def test_two_process_dp_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out

    import re

    results = {}
    for out in outs:
        # regex-extract: under heavy load other threads' writes can merge
        # into the RESULT line, so a naive split is not robust
        m = re.search(r"RESULT pid=(\d+) loss=([-\d.einfa]+) "
                      r"checksum=([-\d.einfa]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}, results
    (l0, c0), (l1, c1) = results[0], results[1]
    assert np.isfinite(l0) and l0 == l1, results
    # replicated params must be bit-identical on both ranks after the update
    assert c0 == c1, results
