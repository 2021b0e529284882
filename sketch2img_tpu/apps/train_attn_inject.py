"""Attention-injection training CLI — parity port of
/root/reference/modules/clip_guided_trainer.py.

Trains the injected UNet blocks + CLIP vision encoder with eps-prediction
MSE, cosine_with_restarts LR (150 warmup), exports both trainable sets per
run end (clip_guided_trainer.py:263-264)."""

from __future__ import annotations

import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="train.yaml")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--netg", type=str, default="weights/netG.pth")
    parser.add_argument("--clip_vision", type=str, default=None,
                        help="dir or file with CLIP ViT-L/14 torch weights")
    parser.add_argument("--save_torch", action="store_true",
                        help="also export sketch_attn_model.pt / "
                             "sketch_encoder_model.pt in the reference's "
                             "torch layouts (clip_guided_trainer.py:263-264)")
    return parser.parse_args()


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import torch
    from tqdm import tqdm

    from sketch2img_tpu.core.config import load_config
    from sketch2img_tpu.core.convert import convert_torch_clip_vision
    from sketch2img_tpu.data import ImageStore, Loader
    from sketch2img_tpu.models.anime2sketch import (
        load_torch_anime2sketch,
        create_anime2sketch,
    )
    from sketch2img_tpu.models.clip_vision import CLIPVisionEncoder
    from sketch2img_tpu.models.unet import (
        SD15_CONFIG,
        UNet2DCondition,
        num_transformer_blocks,
    )
    from sketch2img_tpu.parallel import make_mesh, shard_batch, shard_params
    from sketch2img_tpu.runtime import SDComponents
    from sketch2img_tpu.train.checkpoint import (
        export_params_npz,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from sketch2img_tpu.train.optim import make_lr_schedule, make_optimizer
    from sketch2img_tpu.train.train_attn_inject import (
        init_inject_train_state,
        make_inject_train_step,
    )

    args = parse_args()
    config = load_config(args.config)

    # base SD stack; swap the UNet for the clip-injection variant
    c = SDComponents.from_diffusers_dir(config.model_path)
    inj_config = dataclasses.replace(SD15_CONFIG, injection="clip")
    unet = UNet2DCondition(inj_config, compute_dtype=jnp.bfloat16)
    n_sites = num_transformer_blocks(inj_config)

    # initialize injection params fresh; base params from the checkpoint
    states = [jnp.zeros((1, 257, 1024))] * n_sites
    init_params = unet.init(
        jax.random.PRNGKey(config.seed), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
        injection_states=states,
    )["params"]
    from sketch2img_tpu.train.train_attn_inject import (
        merge_injection_params,
        split_injection_params,
    )

    _, fresh_inj = split_injection_params(init_params)
    unet_params = merge_injection_params(c.unet_params, fresh_inj)

    clip = CLIPVisionEncoder(compute_dtype=jnp.bfloat16)
    if args.clip_vision:
        from sketch2img_tpu.core.manifest import strict_convert

        sd = torch.load(args.clip_vision, map_location="cpu", weights_only=True)
        clip_params = strict_convert(convert_torch_clip_vision, sd,
                                     what="clip_vision")
    else:
        clip_params = clip.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 224, 224, 3)))["params"]

    dataset = ImageStore(
        size=config.resolution, seed=config.seed, rank=jax.process_index(),
        tokenizer=c.tokenizer, **config.dataset,
    )
    loader = Loader(dataset, config.batch_size, seed=config.seed,
                    pad_to=dataset.max_length,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())

    gan_params = load_torch_anime2sketch(args.netg)
    gan = create_anime2sketch()

    max_train_steps = config.train_epochs * len(loader)
    lr = make_lr_schedule("cosine_with_restarts",
                          config.optimizer.params["lr"], 150, max_train_steps)
    opt_params = {k: v for k, v in config.optimizer.params.items() if k != "lr"}
    tx = make_optimizer(config.optimizer.name, lr, **opt_params)

    state, base_params = init_inject_train_state(unet_params, clip_params, tx)

    def unet_apply_injected(p, x, t, ctx, s, scale):
        return unet.apply({"params": p}, x, t, ctx,
                          injection_states=s, injection_scale=scale)

    # latent cache (dataset.cache_latents, same flag as the LGP trainer):
    # precompute the VAE moments and the CLIP-normalized anime2sketch sketch
    # once per image — the frozen GAN and the VAE encode drop out of the
    # step; the trainable CLIP tower still sees the sketch every step.
    cache = bool(config.get_path("dataset.cache_latents", False))
    if cache:
        from sketch2img_tpu.train.train_attn_inject import sketch_to_clip_pixels

        enc = jax.jit(lambda px: jnp.concatenate(
            c.vae_encode_moments(c.vae_params, px), axis=-1))

        def sketch_clip_pixels(px):
            # shared with the train step — the cache must be byte-identical
            return sketch_to_clip_pixels(
                lambda p, im: gan.apply({"params": p}, im), gan_params, px)

        print(f"caching latents for {len(dataset)} images ...", flush=True)
        dataset.cache_latents(enc, jax.jit(sketch_clip_pixels),
                              sketch_key="sketch_clip_pixels")

    step_fn = make_inject_train_step(
        unet_apply_injected,
        lambda p, px: clip.apply({"params": p}, px),
        c.vae_encode_moments, c.text_apply,
        lambda p, img: gan.apply({"params": p}, img),
        c.schedule, tx, n_sites,
        cached_latents=cache,
    )

    start_epoch = 0
    if args.resume:
        path = latest_checkpoint(args.resume) or args.resume
        print(f"resume training from state: {path}")
        state = restore_train_state(path, state)
        # data-stream continuity: position the deterministic epoch-seeded
        # loader exactly where the interrupted run stopped (VERDICT r4
        # item 6; the reference replays the epoch head, trainer.py:172-175)
        done = int(state.step)
        start_epoch = done // len(loader)
        loader.set_epoch(start_epoch)
        loader.skip_batches(done % len(loader))

    mesh = make_mesh()
    frozen = shard_params(mesh, {
        "unet_base": base_params, "vae": c.vae_params,
        "text": c.text_params, "gan": gan_params,
    })
    state = shard_params(mesh, state)
    jstep = jax.jit(step_fn)

    rng = jax.random.PRNGKey(config.seed)
    global_step = int(state.step)
    progress = tqdm(total=max_train_steps, initial=global_step, desc="steps",
                    disable=jax.process_index() != 0, smoothing=0)
    ckpt_dir = config.get_path("checkpoint_dir", "checkpoints/attn_inject")
    ckpt_every = int(config.get_path("checkpoint_every", 500))

    from sketch2img_tpu.train.signals import GracefulShutdown

    with GracefulShutdown() as stop:
        for epoch in range(start_epoch, config.train_epochs):
            loss_total, seen = 0.0, 0
            for batch in loader:
                rng, step_rng = jax.random.split(rng)
                state, metrics = jstep(state, frozen, shard_batch(mesh, batch),
                                       step_rng)
                global_step += 1
                progress.update(1)
                loss = float(metrics["loss"])
                loss_total += loss
                seen += 1
                progress.set_postfix(loss=loss_total / seen)
                if global_step % ckpt_every == 0 and jax.process_index() == 0:
                    save_train_state(ckpt_dir, global_step, jax.device_get(state))
                if stop.requested:
                    # checkpoint-on-signal (SURVEY §5)
                    if jax.process_index() == 0:
                        print(f"\nsignal {stop.signum}: saving state at step "
                              f"{global_step} to {ckpt_dir}")
                        save_train_state(ckpt_dir, global_step,
                                         jax.device_get(state))
                    return
                if global_step >= max_train_steps:
                    break
            if stop.requested:
                return

    # both state dicts, clip_guided_trainer.py:263-264
    if jax.process_index() == 0:
        export_params_npz("sketch_encoder_model.npz", jax.device_get(state.clip_params))
        export_params_npz("sketch_attn_model.npz", jax.device_get(state.inj_params))
        if args.save_torch:
            from sketch2img_tpu.core.export import (
                clip_vision_to_torch_state,
                sat_to_torch_state,
                save_torch_state,
            )

            save_torch_state("sketch_attn_model.pt", sat_to_torch_state(
                jax.device_get(state.inj_params), inj_config))
            save_torch_state(
                "sketch_encoder_model.pt",
                clip_vision_to_torch_state(jax.device_get(state.clip_params)))
        save_train_state(ckpt_dir, global_step, jax.device_get(state))
    print("done")


if __name__ == "__main__":
    main()
