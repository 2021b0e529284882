"""LGP training CLI — parity port of /root/reference/trainer.py.

Same surface: ``--config`` YAML (train.yaml schema), ``--resume`` state dir;
constant_with_warmup LR (150 steps), per-epoch model export, optional wandb.
TPU-native core: one jit'd train step over a (data,)-sharded batch — DDP /
AMP / bitsandbytes are replaced by the mesh, the dtype policy and optax
(SURVEY.md §2.2 D7-D9).
"""

from __future__ import annotations

import argparse
import time


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="train.yaml")
    parser.add_argument("--network_weights", type=str, default=None,
                        help="resume LGP params only (npz)")
    parser.add_argument("--resume", type=str, default=None,
                        help="orbax train-state directory")
    parser.add_argument("--netg", type=str, default="weights/netG.pth",
                        help="anime2sketch generator weights (trainer.py:114)")
    parser.add_argument("--save_torch", action="store_true",
                        help="also export edge_predictor.pt in the "
                             "reference's torch layout (trainer.py:279) so "
                             "the torch stack can serve these weights")
    return parser.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    from tqdm import tqdm

    from sketch2img_tpu.core.config import load_config
    from sketch2img_tpu.data import ImageStore, Loader
    from sketch2img_tpu.models.anime2sketch import (
        load_torch_anime2sketch,
        create_anime2sketch,
    )
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.parallel import make_mesh, shard_batch, shard_params
    from sketch2img_tpu.runtime import SDComponents
    from sketch2img_tpu.train.checkpoint import (
        export_params_npz,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from sketch2img_tpu.train.optim import make_lr_schedule, make_optimizer
    from sketch2img_tpu.train.train_lgp import (
        init_lgp_train_state,
        make_lgp_train_step,
    )

    args = parse_args()
    config = load_config(args.config)

    # dataset (trainer.py:82-89)
    c = SDComponents.from_diffusers_dir(config.model_path)
    dataset = ImageStore(
        size=config.resolution,
        seed=config.seed,
        rank=jax.process_index(),
        tokenizer=c.tokenizer,
        **config.dataset,
    )
    arb_enabled = bool(config.get_path("arb.enabled", False))
    if arb_enabled:
        # aspect-ratio bucketing (train.yaml arb: block — dead in the
        # reference, live here): same-bucket batches, one XLA program per
        # bucket resolution
        from sketch2img_tpu.data.arb import BucketBatcher

        assignments = dataset.enable_arb(dict(config.get_path("arb", {})))
        batcher = BucketBatcher(assignments, config.batch_size, seed=config.seed)

        def arb_loader():
            for bucket, idxs in batcher:
                examples = [dataset.get_bucketed(i, bucket) for i in idxs]
                yield dataset.collate_fn(examples, pad_to=dataset.max_length)

        loader = arb_loader
        loader_len = len(batcher)
    else:
        loader = Loader(
            dataset, config.batch_size, seed=config.seed,
            pad_to=dataset.max_length,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        loader_len = len(loader)

    # sketch generator (trainer.py:113-116)
    gan_params = load_torch_anime2sketch(args.netg)
    gan = create_anime2sketch()

    # LGP (trainer.py:110-111: 9320 -> 4, 9 octaves), fp32 like the reference
    lgp = LatentEdgePredictor()
    lgp_vars = lgp.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((1, 2, 2, 9280)), jnp.zeros((1, 2, 2, 4)), train=False,
    )

    max_train_steps = config.train_epochs * loader_len
    lr = make_lr_schedule(
        "constant_with_warmup",
        config.optimizer.params["lr"],
        150, max_train_steps,  # trainer.py:137-142
    )
    opt_params = {k: v for k, v in config.optimizer.params.items() if k != "lr"}
    tx = make_optimizer(config.optimizer.name, lr, **opt_params)

    # latent cache (train.yaml dataset.cache_latents — dead in the
    # reference, live here): precompute the VAE moments for every image AND
    # its anime2sketch sketch once, dropping the GAN + both VAE encodes from
    # the train step (measured ~80% of the uncached step). Per-step latent
    # sampling stays stochastic. Skipped under ARB (bucketed resolutions
    # would need one cache entry per bucket).
    cache = bool(config.get_path("dataset.cache_latents", False)) and not arb_enabled
    if cache:
        from sketch2img_tpu.train.train_lgp import generate_sketch

        enc = jax.jit(lambda px: jnp.concatenate(
            c.vae_encode_moments(c.vae_params, px), axis=-1))

        def sketch_moments(px):
            img = generate_sketch(
                lambda p, im: gan.apply({"params": p}, im), gan_params, px)
            return jnp.concatenate(
                c.vae_encode_moments(c.vae_params, img), axis=-1)

        print(f"caching latents for {len(dataset)} images ...", flush=True)
        dataset.cache_latents(enc, jax.jit(sketch_moments))

    step_fn = make_lgp_train_step(
        lambda v, f, nl, train: lgp.apply(v, f, nl, train=train,
                                          mutable=["batch_stats"]),
        c.unet_apply_taps,
        c.vae_encode_moments,
        c.text_apply,
        lambda p, img: gan.apply({"params": p}, img),
        c.schedule, tx,
        cached_latents=cache,
    )
    state = init_lgp_train_state(lgp_vars, tx)

    start_epoch = 0
    if args.resume:
        path = latest_checkpoint(args.resume) or args.resume
        print(f"resume training from state: {path}")
        state = restore_train_state(path, state)
        # data-stream continuity (VERDICT r4 item 6; reference gap —
        # accelerate.load_state never skips the epoch head,
        # trainer.py:172-175): the loaders are deterministic and
        # epoch-seeded, so position the stream exactly where the
        # interrupted run stopped. The skipped batches are never loaded.
        done = int(state.step)
        start_epoch = done // loader_len
        pos = (batcher if arb_enabled else loader)
        pos.set_epoch(start_epoch)
        pos.skip_batches(done % loader_len)

    # mesh: data-parallel batch, replicated params (trainer.py:91-98 / D8)
    mesh = make_mesh()
    frozen = shard_params(mesh, {
        "unet": c.unet_params, "vae": c.vae_params,
        "text": c.text_params, "gan": gan_params,
    })
    state = shard_params(mesh, state)
    jstep = jax.jit(step_fn)

    use_wandb = bool(config.get_path("monitor.wandb_id", ""))
    if use_wandb and jax.process_index() == 0:
        import wandb

        wandb.init(project=config.monitor.wandb_id, reinit=False)

    # mid-training sampling (the reference's dead sampling: block, made real)
    from sketch2img_tpu.runtime import SketchGuidedPipeline
    from sketch2img_tpu.train.sampling import TrainingSampler

    helper = SketchGuidedPipeline(c)
    sampler = TrainingSampler(
        config.get_path("sampling", {}),
        c.unet_apply, c.vae_decode, helper.encode_prompt, c.schedule,
    )

    rng = jax.random.PRNGKey(config.seed)
    global_step = int(state.step)
    progress = tqdm(total=max_train_steps, initial=global_step, desc="steps",
                    disable=jax.process_index() != 0, smoothing=0)
    ckpt_dir = config.get_path("checkpoint_dir", "checkpoints/lgp")
    ckpt_every = int(config.get_path("checkpoint_every", 500))

    from sketch2img_tpu.train.signals import GracefulShutdown

    stop = GracefulShutdown()
    stop.__enter__()

    for epoch in range(start_epoch, config.train_epochs):
        progress.set_description_str(f"Epoch {epoch + 1}/{config.train_epochs}")
        loss_total, seen = 0.0, 0
        t_prev = time.perf_counter()
        for batch in (loader() if arb_enabled else loader):
            rng, step_rng = jax.random.split(rng)
            state, metrics = jstep(state, frozen, shard_batch(mesh, batch), step_rng)
            global_step += 1
            progress.update(1)
            loss = float(metrics["loss"])  # host fetch = step sync point
            t_now = time.perf_counter()
            imgs_per_sec = config.batch_size / max(t_now - t_prev, 1e-9)
            t_prev = t_now
            loss_total += loss
            seen += 1
            progress.set_postfix(loss=loss_total / seen,
                                 img_s=f"{imgs_per_sec:.1f}")
            if use_wandb and jax.process_index() == 0:
                import wandb

                wandb.log({"loss": loss, "lr": float(lr(global_step)),
                           "images_per_sec": imgs_per_sec}, step=global_step)
            if global_step % ckpt_every == 0 and jax.process_index() == 0:
                save_train_state(ckpt_dir, global_step, jax.device_get(state))
            if sampler.should_sample(step=global_step) and jax.process_index() == 0:
                sampler(c.unet_params, c.vae_params, f"step{global_step}")
            if stop.requested:
                # checkpoint-on-signal (SURVEY §5): flush state and exit
                if jax.process_index() == 0:
                    print(f"\nsignal {stop.signum}: saving state at step "
                          f"{global_step} to {ckpt_dir}")
                    save_train_state(ckpt_dir, global_step, jax.device_get(state))
                progress.close()
                stop.__exit__()
                return
            if global_step >= max_train_steps:
                break

        if sampler.should_sample(epoch=epoch) and jax.process_index() == 0:
            sampler(c.unet_params, c.vae_params, f"epoch{epoch + 1}")

        # per-epoch model export (+ optional hub push, trainer.py:273-279)
        if jax.process_index() == 0:
            export_params_npz(
                "edge_predictor.npz",
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
            )
            if args.save_torch:
                from sketch2img_tpu.core.export import (
                    lgp_to_torch_state,
                    save_torch_state,
                )

                save_torch_state("edge_predictor.pt", lgp_to_torch_state(
                    {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}))
            repo = config.get_path("monitor.huggingface_repo", "")
            if repo:
                from sketch2img_tpu.utils.hub import push_file

                push_file(repo, "edge_predictor.npz",
                          token=config.get_path("monitor.huggingface_token"),
                          commit_message=f"add/update model: epoch {epoch}")
                if args.save_torch:
                    # publish the torch-layout artifact too, so reference-
                    # stack users can pull it straight from the hub
                    # (trainer.py:273-279 publishes the torch state dict)
                    push_file(repo, "edge_predictor.pt",
                              token=config.get_path(
                                  "monitor.huggingface_token"),
                              commit_message=f"add/update model (torch): "
                                             f"epoch {epoch}")

    stop.__exit__()
    if jax.process_index() == 0:
        save_train_state(ckpt_dir, global_step, jax.device_get(state))
    print("done")


if __name__ == "__main__":
    main()
