"""Checkpoint-on-signal (SURVEY §5): SIGTERM to a running training loop
flushes one final orbax save before exit."""

import os
import signal
import subprocess
import sys
import time

from sketch2img_tpu.train.signals import GracefulShutdown

_LOOP = """
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from sketch2img_tpu.train.checkpoint import save_train_state
from sketch2img_tpu.train.signals import GracefulShutdown
from sketch2img_tpu.train.train_lgp import LGPTrainState

ckpt_dir = sys.argv[1]
params = {"w": jnp.ones((4, 4))}
tx = optax.adamw(1e-3)
state = LGPTrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      batch_stats={}, opt_state=tx.init(params))

step = 0
with GracefulShutdown() as stop:
    print("ready", flush=True)
    while True:
        step += 1
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        time.sleep(0.01)
        if stop.requested:
            save_train_state(ckpt_dir, step, jax.device_get(state))
            print(f"saved at {step}", flush=True)
            break
print("clean exit", flush=True)
"""


def test_sigterm_saves_checkpoint(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", _LOOP, ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        assert proc.stdout.readline().strip() == "ready"
        time.sleep(0.2)  # let it take a few steps
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert proc.returncode == 0, err
    assert "saved at" in out and "clean exit" in out, (out, err)

    from sketch2img_tpu.train.checkpoint import latest_checkpoint

    path = latest_checkpoint(ckpt_dir)
    assert path is not None, os.listdir(ckpt_dir)


def test_graceful_shutdown_flag_and_restore():
    """In-process: handler sets the flag, second registration restores the
    previous handler on exit."""
    before = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown(signals=(signal.SIGTERM,)) as stop:
        assert not stop.requested
        signal.raise_signal(signal.SIGTERM)
        assert stop.requested
        assert stop.signum == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before
