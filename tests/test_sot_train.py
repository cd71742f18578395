"""SOT train-split adapters: on-disk benchmark layout -> Siamese
training pairs -> a real train step (VERDICT r2 item 8)."""

import numpy as np
import pytest
from PIL import Image

from tao_amodal_tpu.data.sot_datasets import load_sot_dataset
from tao_amodal_tpu.data.sot_train import (
    SotSequenceSource,
    load_pair,
    pair_batch_iter,
)
from tao_amodal_tpu.train.sampler import TrackPairSampler


@pytest.fixture(scope="module")
def lasot_like_root(tmp_path_factory):
    """LaSOT layout: <root>/<class>/<class>-<id>/{img/,
    groundtruth.txt}."""
    root = tmp_path_factory.mktemp("lasot")
    rng = np.random.RandomState(0)
    for cls, sid in (("cat", 1), ("cat", 2), ("dog", 1)):
        d = root / cls / f"{cls}-{sid}"
        (d / "img").mkdir(parents=True)
        gt = []
        base = rng.randint(0, 255, (96, 128, 3), np.uint8)
        for t in range(6):
            img = np.roll(base, 3 * t, axis=1)
            img[40:70, 30 + 3 * t:60 + 3 * t] = (250, 10, 10)
            Image.fromarray(img).save(d / "img" / f"{t:08d}.jpg")
            gt.append([30 + 3 * t, 40, 30, 30])
        np.savetxt(str(d / "groundtruth.txt"), np.asarray(gt, float),
                   delimiter=",", fmt="%.1f")
    return str(root)


def test_source_and_pair_geometry(lasot_like_root):
    ds = load_sot_dataset("lasot", lasot_like_root)
    source = SotSequenceSource(ds)
    assert source.num_tracks == 3
    frames = source.track_frames(0)
    assert len(frames) == 6 and frames[0]["bbox"][2] == 30

    t, x, box = load_pair(frames[0], frames[3], exemplar_size=64,
                          instance_size=128)
    assert t.shape == (64, 64, 3) and x.shape == (128, 128, 3)
    # Target is centered in the search crop; size scaled by the crop.
    assert box[0] == box[1] == 64.0
    assert 10 < box[2] < 128 and box[2] == box[3]  # square target
    # The (red) target pixels dominate the search-crop center.
    cy, cx = 64, 64
    center = x[cy - 5:cy + 5, cx - 5:cx + 5]
    assert center[..., 0].mean() > 1.6 * center[..., 1].mean()


def test_pair_batches_feed_train_step(lasot_like_root):
    ds = load_sot_dataset("lasot", lasot_like_root)
    source = SotSequenceSource(ds)
    sampler = TrackPairSampler([source], frame_range=5, neg_prob=0.5,
                               seed=1)
    batches = pair_batch_iter(sampler, [source], batch_size=4,
                              exemplar_size=64, instance_size=128)
    batch = next(batches)
    assert batch["template"].shape == (4, 64, 64, 3)
    assert batch["search"].shape == (4, 128, 128, 3)
    assert batch["box"].shape == (4, 4)

    # One real Siamese train step on the disk-fed batch.
    from tao_amodal_tpu.config import default_config
    from tao_amodal_tpu.cli.train_cli import build_siamese_training
    from tao_amodal_tpu.parallel.mesh import make_mesh, shard_batch

    import jax

    cfg = default_config()
    cfg.track.exemplar_size = 64
    cfg.track.instance_size = 128
    cfg.track.base_size = 0
    cfg.train.batch_size = 4
    mesh = make_mesh(model=1)  # all (virtual) devices on data
    n = mesh.shape["data"]
    if 4 % n:  # pad the batch to the mesh's data size
        reps = -(-n // 4)
        batch = {k: np.concatenate([v] * reps)[:n]
                 for k, v in batch.items()}
    step, state = build_siamese_training(cfg, mesh)
    state, metrics = step(state, shard_batch(mesh, batch),
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_negative_pairs_get_zero_box(lasot_like_root):
    ds = load_sot_dataset("lasot", lasot_like_root)
    source = SotSequenceSource(ds)
    sampler = TrackPairSampler([source], neg_prob=1.0, seed=2)
    batches = pair_batch_iter(sampler, [source], batch_size=2,
                              exemplar_size=64, instance_size=128)
    batch = next(batches)
    assert np.all(batch["box"][:, 2:] == 0.0)
