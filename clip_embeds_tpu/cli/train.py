"""Training CLI: the TPU equivalent of `torchrun -m training.main`.

Reference: open_clip/src/open_clip_train/main.py + train.py and the launch
recipe in open_clip/src/train-clip.sh:7-43 (ViT-L-14-336, --lock-image,
--usehardtext, --augfiles leftright.json, datamix data). One process drives the
whole mesh; there is no per-rank bootstrap.

Example:
  python -m clip_embeds_tpu.cli.train --model ViT-L-14-336 \
      --dataset-type synthetic --train-num-samples 64 --batch-size 16 --epochs 1
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from typing import Dict, Iterator

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("clip_embeds_tpu trainer")
    p.add_argument("--model", default="ViT-L-14-336")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--batch-size", type=int, default=64, help="global batch")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.98)
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--wd", type=float, default=0.1)
    p.add_argument("--warmup", type=int, default=140)
    p.add_argument("--lr-scheduler", default="cosine",
                   choices=["cosine", "const", "const-cooldown"])
    p.add_argument("--lock-image", action="store_true",
                   help="LiT: freeze the vision tower (main.py:271-275)")
    p.add_argument("--usehardtext", action="store_true")
    p.add_argument("--augfiles", nargs="*", default=None)
    p.add_argument("--siglip", action="store_true")
    p.add_argument("--distill-model", default=None,
                   help="teacher arch to distill from (params.py:461-464)")
    p.add_argument("--distill-pretrained", default=None,
                   help="teacher weights tag/path (params.py:466-469)")
    p.add_argument("--grad-cache-chunks", type=int, default=0)
    p.add_argument("--grad-checkpointing", action="store_true")
    p.add_argument("--grad-checkpointing-policy", default="full",
                   choices=["full", "dots"],
                   help="'dots' keeps matmul outputs resident "
                        "(jax dots_with_no_batch_dims_saveable)")
    p.add_argument("--dataset-type", default="synthetic",
                   choices=["synthetic", "datamix", "csv", "webdataset",
                            "auto"])
    p.add_argument("--train-data", nargs="*", default=None,
                   help="datamix annotation jsons / csv-tsv file / wds "
                        "tar url(s) with {000..127} brace expansion")
    p.add_argument("--csv-img-key", default="filepath")
    p.add_argument("--csv-caption-key", default="title")
    p.add_argument("--csv-separator", default="\t")
    p.add_argument("--lcs-root", default=None)
    p.add_argument("--datamix-root", default=None)
    p.add_argument("--train-num-samples", type=int, default=64)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", default=None, help="'latest' or a path")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def build_data(args, model_cfg) -> Iterator[Dict[str, np.ndarray]]:
    dataset_type = args.dataset_type
    if dataset_type == "auto":
        # reference get_dataset_fn auto rule (data.py:675-683)
        ext = args.train_data[0].split(".")[-1]
        if ext in ("csv", "tsv"):
            dataset_type = "csv"
        elif ext == "tar":
            dataset_type = "webdataset"
        else:
            raise ValueError(
                f"cannot infer dataset type from extension {ext!r}")
    if dataset_type == "csv":
        from ..data.csv_dataset import CsvPairDataset, csv_batches
        from ..text.tokenizer import get_tokenizer

        ds = CsvPairDataset(
            args.train_data[0], img_key=args.csv_img_key,
            caption_key=args.csv_caption_key, sep=args.csv_separator,
        )
        steps = len(ds) // args.batch_size
        return csv_batches(
            ds, args.batch_size, model_cfg.vision.image_size,
            get_tokenizer(), seed=args.seed,
        ), steps
    if dataset_type == "webdataset":
        from ..data.wds import (
            ShardedTarDataset,
            decode_raw_image_text,
            wds_batches,
        )

        ds = ShardedTarDataset(
            args.train_data if len(args.train_data) > 1
            else args.train_data[0],
            decode=decode_raw_image_text, seed=args.seed,
        )
        steps = max(args.train_num_samples // args.batch_size, 1)
        batches = wds_batches(
            ds, args.batch_size, image_size=model_cfg.vision.image_size,
        )
        return batches, steps
    if dataset_type == "synthetic":
        from ..data.synthetic import synthetic_batches

        steps = max(args.train_num_samples // args.batch_size, 1)
        return synthetic_batches(
            args.batch_size,
            model_cfg.vision.image_size,
            model_cfg.text.context_length,
            num_batches=steps,
            hard_negatives=args.batch_size // 4 if args.usehardtext else 0,
            seed=args.seed,
        ), steps
    from ..data.datamix import DataMixDataset, datamix_batches
    from ..data.hard_negatives import HardNegativeAugmenter

    aug = None
    if args.usehardtext:
        aug = HardNegativeAugmenter(augfiles=args.augfiles) if args.augfiles \
            else __import__(
                "clip_embeds_tpu.data.hard_negatives", fromlist=["x"]
            ).leftright_augmenter(args.seed)
    ds = DataMixDataset(
        args.train_data,
        {"lcs558k": args.lcs_root, "datamix665k": args.datamix_root},
        image_size=model_cfg.vision.image_size,
        augmenter=aug,
        seed=args.seed,
    )
    steps = len(ds) // args.batch_size
    return datamix_batches(
        ds, args.batch_size,
        max_hard_per_batch=args.batch_size // 4 if args.usehardtext else 0,
        seed=args.seed,
    ), steps


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax
    import jax.numpy as jnp

    from ..core import checkpoint as ckpt
    from ..core.factory import create_model
    from ..parallel.mesh import batch_sharding, create_mesh
    from ..train.optim import adamw
    from ..train.schedules import const_lr, cosine_lr
    from ..train.steps import TrainState, make_clip_train_step

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    remat = args.grad_checkpointing and (
        "dots" if args.grad_checkpointing_policy == "dots" else True
    )
    model, params = create_model(
        args.model, args.pretrained, dtype=dtype,
        remat=remat, seed=args.seed,
    )
    data_iter, steps_per_epoch = build_data(args, model.cfg)
    total_steps = steps_per_epoch * args.epochs

    sched = (
        cosine_lr(args.lr, args.warmup, total_steps)
        if args.lr_scheduler == "cosine" else const_lr(args.lr, args.warmup)
    )
    tx = adamw(sched, args.beta1, args.beta2, args.eps, args.wd)
    if args.lock_image:
        import optax

        # LiT freeze (reference model.py:261-263): zero updates for the
        # visual subtree.
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map_with_path(
                lambda path, _: "freeze"
                if getattr(path[0], "key", "") == "visual" else "train",
                params,
            ),
        )
    state = TrainState.create(params, tx)

    start_epoch = 0
    if args.resume and args.checkpoint_dir:
        target = {"params": state.params, "step": np.asarray(0)}
        restored = (
            ckpt.resume(args.checkpoint_dir, target)
            if args.resume == "latest" else ckpt.load(args.resume, target)
        )
        if restored is not None:
            state = state.replace(params=restored["params"])
            start_epoch = int(restored["step"])
            logging.info("resumed at epoch %d", start_epoch)

    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev, 1)
    sharding = batch_sharding(mesh)
    # --distill is active when both teacher flags are set (main.py:208)
    distill = args.distill_model is not None and \
        args.distill_pretrained is not None
    if distill:
        from ..train.steps import make_distill_train_step

        teacher_model, teacher_params = create_model(
            args.distill_model, args.distill_pretrained, dtype=dtype,
        )
        teacher_params = jax.device_put(teacher_params)
        distill_step = jax.jit(
            make_distill_train_step(model, teacher_model), donate_argnums=0
        )
        step_fn = lambda state, batch: distill_step(  # noqa: E731
            state, teacher_params, batch
        )
    else:
        step_fn = jax.jit(make_clip_train_step(
            model, use_siglip=args.siglip, use_hard_text=args.usehardtext,
            grad_cache_chunks=args.grad_cache_chunks,
        ), donate_argnums=0)

    logging.info("devices=%d steps/epoch=%d", n_dev, steps_per_epoch)
    with jax.sharding.set_mesh(mesh):
        for epoch in range(start_epoch, args.epochs):
            if epoch > start_epoch or epoch > 0:
                data_iter, _ = build_data(args, model.cfg)
            t0 = time.perf_counter()
            seen = 0
            for i, batch in enumerate(data_iter):
                batch = jax.tree.map(
                    lambda x: jax.device_put(x, sharding), batch
                )
                state, metrics = step_fn(state, batch)
                seen += args.batch_size
                if (i + 1) % args.log_every == 0 or i + 1 == steps_per_epoch:
                    loss = float(metrics["loss"])  # forces the chain
                    dt = time.perf_counter() - t0
                    logging.info(
                        "epoch %d step %d loss %.4f lr %.2e "
                        "samples/s %.1f samples/s/chip %.1f",
                        epoch, i + 1, loss, float(sched(state.step)),
                        seen / dt, seen / dt / n_dev,
                    )
            if args.checkpoint_dir:
                ckpt.save(
                    args.checkpoint_dir,
                    {"params": jax.device_get(state.params),
                     "step": np.asarray(epoch + 1)},
                    step=epoch + 1,
                )
    logging.info("done: %d steps", int(state.step))
    return state


if __name__ == "__main__":
    main()
