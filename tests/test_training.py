"""Training stack tests: losses, anchor targets, schedules, trainer."""

import numpy as np
import jax
import jax.numpy as jnp

from tao_amodal_tpu.train.anchor_target import assign_anchor_targets
from tao_amodal_tpu.train.optim import (
    log_schedule,
    staged_unfreeze_mask,
    warmup_log_schedule,
)
from tao_amodal_tpu.train.siamese_loss import (
    select_cross_entropy,
    weighted_l1,
)


def test_anchor_targets_budget_and_labels():
    rng = jax.random.PRNGKey(0)
    # Anchor grid around origin; gt centered at (0, 0).
    xs = jnp.linspace(-50, 50, 21)  # includes 0 -> one exact anchor
    cx, cy = jnp.meshgrid(xs, xs)
    n = 21 * 21
    anchors = jnp.stack([cx.ravel(), cy.ravel(),
                         jnp.full((n,), 40.0),
                         jnp.full((n,), 40.0)], axis=1)
    gt = jnp.array([0.0, 0.0, 40.0, 40.0])
    out = assign_anchor_targets(anchors, gt, rng, num_pos=16,
                                num_total=64)
    n_pos = int(jnp.sum(out["label"] == 1))
    n_neg = int(jnp.sum(out["label"] == 0))
    assert 1 <= n_pos <= 16
    assert n_pos + n_neg <= 64
    # The exact-match anchor must have iou 1 and positive label
    # possible; deltas at it are zero.
    exact = int(jnp.argmax(out["iou"]))
    np.testing.assert_allclose(np.asarray(out["delta"][exact]),
                               [0, 0, 0, 0], atol=1e-5)


def test_select_ce_and_weighted_l1():
    logits = jnp.asarray([[0.0, 10.0], [10.0, 0.0], [0.0, 0.0]])
    label = jnp.asarray([1, 0, -1])
    pw = jnp.asarray([1.0, 0.0, 0.0])
    nw = jnp.asarray([0.0, 1.0, 0.0])
    loss = select_cross_entropy(logits, label, pw, nw)
    assert float(loss) < 0.01  # both confident & correct
    l1 = weighted_l1(jnp.ones((3, 4)), jnp.zeros((3, 4)), pw)
    assert abs(float(l1) - 4.0) < 1e-6


def test_schedules():
    s = log_schedule(1e-2, 1e-4, 100)
    assert abs(float(s(0)) - 1e-2) < 1e-9
    assert abs(float(s(99)) - 1e-4) < 1e-9
    assert float(s(150)) == float(s(99))  # clamps
    w = warmup_log_schedule(1e-3, 1e-2, 10, 1e-2, 1e-4, 100)
    assert float(w(0)) < float(w(9)) <= 1e-2 + 1e-9


def test_staged_unfreeze():
    params = {"params": {"backbone": {"k": jnp.ones(2)},
                         "head": {"k": jnp.ones(2)}}}
    m0 = staged_unfreeze_mask(params, ["backbone"], step=0,
                              unfreeze_step=10)
    m1 = staged_unfreeze_mask(params, ["backbone"], step=20,
                              unfreeze_step=10)
    assert m0["params"]["backbone"]["k"] is False
    assert m0["params"]["head"]["k"] is True
    assert m1["params"]["backbone"]["k"] is True


def test_checkpoint_utils(tmp_path):
    from tao_amodal_tpu.utils.checkpoint import (
        load_pretrain,
        load_pytree,
        save_pytree,
    )

    params = {"a": {"w": jnp.zeros((2, 2)), "b": jnp.zeros(3)},
              "head": {"w": jnp.zeros(4)}}
    pretrained = {"a": {"w": jnp.ones((2, 2)),
                        "b": jnp.ones(5)}}  # b mismatched
    merged, report = load_pretrain(params, pretrained)
    assert np.asarray(merged["a"]["w"]).sum() == 4
    assert np.asarray(merged["a"]["b"]).sum() == 0  # skipped
    assert len(report["shape_mismatch"]) == 1

    path = tmp_path / "ckpt.npz"
    save_pytree(str(path), merged)
    back = load_pytree(str(path))
    np.testing.assert_array_equal(np.asarray(back["a"]["w"]),
                                  np.ones((2, 2)))


def test_prefetch_loader():
    from tao_amodal_tpu.data.loader import PrefetchLoader, stack_collate

    def samples():
        for i in range(10):
            yield {"x": np.full((2,), i)}

    loader = PrefetchLoader(samples(), stack_collate, batch_size=2,
                            num_workers=1)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["x"].shape == (2, 2)
    loader.close()


def test_samplers():
    from tao_amodal_tpu.train.sampler import (
        SequenceSampler,
        TrackPairSampler,
    )

    class FakeSource:
        num_tracks = 4

        def track_frames(self, t):
            return [{"frame": i} for i in range(12)]

    s = TrackPairSampler([FakeSource()], frame_range=3, neg_prob=0.5,
                         seed=0)
    pairs = [s.sample() for _ in range(50)]
    negs = [p for p in pairs if p["is_negative"]]
    pos = [p for p in pairs if not p["is_negative"]]
    assert negs and pos
    for p in pos:
        assert abs(p["template"][2] - p["search"][2]) <= 3

    seq = SequenceSampler([FakeSource()], num_train_frames=2,
                          num_test_frames=3, max_gap=4, seed=0)
    out = seq.sample()
    assert len(out["train_frames"]) == 2
    assert len(out["test_frames"]) == 3


def test_trainer_fail_safe_recovers(tmp_path):
    """A mid-training crash restores the latest checkpoint and
    continues (reference base_trainer.py:60-88 behavior)."""
    from tao_amodal_tpu.train.loop import TrainConfig, Trainer

    calls = {"n": 0}

    def step(state, batch, rng):
        return state + 1, {"loss": jnp.float32(0.5)}

    crash_once = {"armed": True}

    def data_iter(epoch):
        for i in range(3):
            if epoch == 1 and i == 1 and crash_once["armed"]:
                crash_once["armed"] = False
                raise RuntimeError("injected fault")
            calls["n"] += 1
            yield {"x": np.zeros(1)}

    trainer = Trainer(step, jnp.zeros(()), data_iter,
                      TrainConfig(num_epochs=3, steps_per_epoch=3,
                                  checkpoint_dir=str(tmp_path),
                                  log_every=100,
                                  fail_safe_retries=3))
    state = trainer.train()
    assert trainer.epoch == 3
    # Crash happened after epoch 0's checkpoint; epoch 1 was retried.
    assert not crash_once["armed"]
    assert float(state) >= 9  # at least 3 epochs x 3 steps applied


def test_trainer_fail_safe_exhausts(tmp_path):
    from tao_amodal_tpu.train.loop import TrainConfig, Trainer

    def step(state, batch, rng):
        return state, {"loss": jnp.float32(0.0)}

    def data_iter(epoch):
        raise RuntimeError("always broken")
        yield  # pragma: no cover

    trainer = Trainer(step, jnp.zeros(()), data_iter,
                      TrainConfig(num_epochs=1, steps_per_epoch=1,
                                  checkpoint_dir=str(tmp_path),
                                  fail_safe_retries=2))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="always broken"):
        trainer.train()
