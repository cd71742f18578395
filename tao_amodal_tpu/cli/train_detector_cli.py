"""Detector + Amodal-Expander training CLI.

The Amodal-Expander training capability (the reference delegates it to
the companion repo, ``README.md:99``): composite RPN + expander loss
(:mod:`tao_amodal_tpu.train.detector_loss`) over the data-parallel
mesh, with Trainer checkpointing.  ``--smoke`` runs on synthetic
frames+boxes end to end.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger(__name__)


def synthetic_detection_batch(rng, batch_size, hw=128, max_gt=4):
    H = W = hw
    images = rng.rand(batch_size, H, W, 3).astype(np.float32) * 40
    gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_amodal = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_classes = np.zeros((batch_size, max_gt), np.int32)
    gt_valid = np.zeros((batch_size, max_gt), bool)
    for b in range(batch_size):
        n = rng.randint(1, max_gt + 1)
        for g in range(n):
            w, h = rng.uniform(20, 60, 2)
            x0 = rng.uniform(0, W - w)
            y0 = rng.uniform(0, H - h)
            images[b, int(y0):int(y0 + h), int(x0):int(x0 + w)] += 160
            gt_boxes[b, g] = [x0, y0, x0 + w, y0 + h]
            # Amodal box extends beyond the visible one.
            gt_amodal[b, g] = [x0 - 0.1 * w, y0 - 0.1 * h,
                               x0 + 1.1 * w, y0 + 1.1 * h]
            gt_classes[b, g] = rng.randint(1, 4)
            gt_valid[b, g] = True
    return {"images": images, "gt_boxes": gt_boxes,
            "gt_amodal": gt_amodal, "gt_classes": gt_classes,
            "gt_valid": gt_valid}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--checkpoint_dir", default="./det_checkpoints")
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--paste_n_occlude", action="store_true",
        help="augment every batch with PasteNOcclude (occluders "
             "pasted over a random gt; visible boxes shrink, amodal "
             "targets stay — the expander training recipe of the "
             "reference's companion repo, README.md:99)")
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (smoke/testing; the axon TPU "
             "tunnel serves one process at a time)")
    parser.add_argument(
        "--occluder_bank", default=None,
        help="npz/npy of [N, P, P, 4] RGBA occluder patches (e.g. "
             "from train.paste_n_occlude.make_occluder_bank over real "
             "segments); default: the synthetic ellipse bank")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tao_amodal_tpu.parallel.dp import make_train_step
    from tao_amodal_tpu.parallel.mesh import make_mesh, shard_batch
    from tao_amodal_tpu.pipeline import AmodalPipeline
    from tao_amodal_tpu.train.detector_loss import detector_train_loss
    from tao_amodal_tpu.train.loop import TrainConfig, Trainer
    from tao_amodal_tpu.train.optim import log_schedule, make_adamw

    mesh = make_mesh()
    if args.smoke:
        args.epochs = 2
        pipeline = AmodalPipeline.create(
            num_classes=8, num_dets=8, num_proposals=16,
            backbone_stages=(1, 1, 1, 1))
        hw = 64
    else:
        pipeline = AmodalPipeline.create()
        hw = 512

    import jax.numpy as jnp

    variables = pipeline.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, hw, hw, 3)))
    optimizer = make_adamw(log_schedule(1e-3, 1e-5, args.epochs * 50))
    opt_state = optimizer.init(variables)

    def loss_fn(params, batch, rng):
        return detector_train_loss(pipeline.detector, pipeline.expander,
                                   params, batch, rng)

    step = make_train_step(loss_fn, optimizer, mesh, donate=False)

    rng = np.random.RandomState(0)
    steps = 3 if args.smoke else 50

    pno = None
    if args.paste_n_occlude:
        from tao_amodal_tpu.train.paste_n_occlude import (
            paste_n_occlude_batch,
            synthetic_occluder_bank,
        )

        if args.occluder_bank:
            bank = jnp.asarray(np.load(args.occluder_bank))
        else:
            bank = synthetic_occluder_bank()

        def pno(batch, step_idx):
            img, gb, gv, _ = paste_n_occlude_batch(
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["gt_boxes"]),
                jnp.asarray(batch["gt_amodal"]),
                jnp.asarray(batch["gt_valid"]), bank,
                jax.random.PRNGKey(9_000_000 + step_idx))
            return dict(batch, images=np.asarray(img),
                        gt_boxes=np.asarray(gb),
                        gt_valid=np.asarray(gv))

    def data_iter(epoch):
        for i in range(steps):
            batch = synthetic_detection_batch(rng, args.batch_size,
                                              hw=hw)
            if pno is not None:
                batch = pno(batch, epoch * steps + i)
            yield shard_batch(mesh, batch)

    trainer = Trainer(step, (variables, opt_state), data_iter,
                      TrainConfig(num_epochs=args.epochs,
                                  steps_per_epoch=steps,
                                  checkpoint_dir=args.checkpoint_dir,
                                  log_every=1 if args.smoke else 20))
    trainer.train(load_latest=args.resume)
    return trainer


if __name__ == "__main__":
    main()
