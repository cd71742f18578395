"""Training CLIs (Siamese tracker + detector/expander).

Capability-parity with the reference training entries
(``pysot/tools/train.py``, ``pytracking/ltr/run_training.py``): build
the model/loss/optimizer from the unified config, data-parallel train
step over the device mesh, checkpointing + fail-safe via the Trainer.

``--smoke`` trains on generated synthetic pairs so the full loop is
runnable without datasets (and is what CI exercises).
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger(__name__)


def synthetic_pair_batch(rng, batch_size, cfg):
    """Synthetic (template, search, box) batches: colored square on
    noise, box jittered off-center."""
    z = cfg.track.exemplar_size
    x = cfg.track.instance_size
    tmpl = rng.rand(batch_size, z, z, 3).astype(np.float32) * 50
    srch = rng.rand(batch_size, x, x, 3).astype(np.float32) * 50
    boxes = np.zeros((batch_size, 4), np.float32)  # cx, cy, w, h
    for i in range(batch_size):
        w, h = rng.uniform(30, 80, 2)
        cx = x / 2 + rng.uniform(-30, 30)
        cy = x / 2 + rng.uniform(-30, 30)
        sq = np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      int)
        srch[i, max(sq[1], 0):sq[3], max(sq[0], 0):sq[2]] += 150
        tw, th = int(w * z / x), int(h * z / x)
        t0 = (z - tw) // 2, (z - th) // 2
        tmpl[i, t0[1]:t0[1] + th, t0[0]:t0[0] + tw] += 150
        boxes[i] = [cx, cy, w, h]
    return {"template": tmpl, "search": srch, "box": boxes}


def build_siamese_training(cfg, mesh):
    import jax
    import jax.numpy as jnp

    from tao_amodal_tpu.models.siamese import SiameseTracker
    from tao_amodal_tpu.parallel.dp import make_train_step
    from tao_amodal_tpu.trackers.siamrpn import (
        SiamConfig,
        generate_anchors,
    )
    from tao_amodal_tpu.train.anchor_target import assign_anchor_targets
    from tao_amodal_tpu.train.optim import (
        make_optimizer,
        warmup_log_schedule,
    )
    from tao_amodal_tpu.train.siamese_loss import siamese_loss

    model = SiameseTracker(num_levels=3)
    scfg = SiamConfig(
        exemplar_size=cfg.track.exemplar_size,
        instance_size=cfg.track.instance_size,
        base_size=cfg.track.base_size, stride=cfg.track.stride,
        ratios=tuple(cfg.track.ratios),
        scales=tuple(cfg.track.scales))

    z = jnp.zeros((1, scfg.exemplar_size, scfg.exemplar_size, 3))
    x = jnp.zeros((1, scfg.instance_size, scfg.instance_size, 3))
    params = model.init(jax.random.PRNGKey(cfg.train.epochs), template=z,
                        search=x, mode="train")
    out_shape = jax.eval_shape(
        lambda p, zz, xx: model.apply(p, template=zz, search=xx,
                                      mode="train"), params, z, x)
    ss = out_shape["cls"].shape[1]
    anchors = generate_anchors(scfg, ss=ss)

    steps_per_epoch = 50
    sched = warmup_log_schedule(
        cfg.train.start_lr / 10, cfg.train.start_lr,
        cfg.train.warmup_epochs * steps_per_epoch, cfg.train.start_lr,
        cfg.train.end_lr, cfg.train.epochs * steps_per_epoch)
    optimizer = make_optimizer(sched,
                               weight_decay=cfg.train.weight_decay,
                               momentum=cfg.train.momentum,
                               clip_norm=cfg.train.grad_clip)

    def loss_fn(params, batch, rng):
        outputs = model.apply(params, template=batch["template"],
                              search=batch["search"], mode="train")
        B = batch["box"].shape[0]
        rngs = jax.random.split(rng, B)
        targets = jax.vmap(
            lambda box, r: assign_anchor_targets(anchors, box, r)
        )(batch["box"], rngs)
        return siamese_loss(outputs, targets,
                            cls_weight=cfg.train.cls_weight,
                            loc_weight=cfg.train.loc_weight)

    step = make_train_step(loss_fn, optimizer, mesh, donate=False)
    opt_state = optimizer.init(params)
    return step, (params, opt_state)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None,
                        help="experiment YAML merged over defaults")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="dotted-path overrides: key value ...")
    parser.add_argument("--smoke", action="store_true",
                        help="synthetic data, 2 tiny epochs")
    parser.add_argument("--dataset", default=None,
                        help="train from an on-disk benchmark layout: "
                             "otb | vot | lasot | got10k | trackingnet "
                             "(train splits; reference "
                             "ltr/dataset/ + pysot TrkDataset "
                             "capability)")
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--neg_prob", type=float, default=0.2)
    parser.add_argument("--frame_range", type=int, default=100)
    parser.add_argument("--checkpoint_dir", default="./checkpoints")
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from tao_amodal_tpu.config import default_config
    from tao_amodal_tpu.parallel.mesh import make_mesh, shard_batch
    from tao_amodal_tpu.train.loop import TrainConfig, Trainer

    cfg = default_config()
    if args.config:
        cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.smoke:
        cfg.track.exemplar_size = 64
        cfg.track.instance_size = 128
        cfg.track.base_size = 0
        cfg.train.epochs = 2
        cfg.train.batch_size = 8

    mesh = make_mesh(data=cfg.mesh.data, model=cfg.mesh.model)
    step, state = build_siamese_training(cfg, mesh)

    rng = np.random.RandomState(0)
    steps = 4 if args.smoke else 50

    if args.dataset and args.dataset_root:
        from tao_amodal_tpu.data.sot_datasets import load_sot_dataset
        from tao_amodal_tpu.data.sot_train import (
            SotSequenceSource,
            pair_batch_iter,
        )
        from tao_amodal_tpu.train.sampler import TrackPairSampler

        source = SotSequenceSource(
            load_sot_dataset(args.dataset, args.dataset_root))
        if source.num_tracks == 0:
            raise SystemExit(
                f"no usable sequences under {args.dataset_root}")
        sampler = TrackPairSampler(
            [source], frame_range=args.frame_range,
            neg_prob=args.neg_prob, seed=0)
        pairs = pair_batch_iter(
            sampler, [source], cfg.train.batch_size,
            exemplar_size=cfg.track.exemplar_size,
            instance_size=cfg.track.instance_size)

        def data_iter(epoch):
            for _ in range(steps):
                yield shard_batch(mesh, next(pairs))
    else:
        def data_iter(epoch):
            for _ in range(steps):
                batch = synthetic_pair_batch(rng, cfg.train.batch_size,
                                             cfg)
                yield shard_batch(mesh, batch)

    trainer = Trainer(
        step, state, data_iter,
        TrainConfig(num_epochs=cfg.train.epochs,
                    steps_per_epoch=steps,
                    checkpoint_dir=args.checkpoint_dir,
                    log_every=2 if args.smoke else 20))
    trainer.train(load_latest=args.resume)
    logger.info("training finished at epoch %d", trainer.epoch)
    return trainer


if __name__ == "__main__":
    main()
