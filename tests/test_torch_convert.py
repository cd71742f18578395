"""Real-weights path: a REAL torch checkpoint (torch-resnet naming,
saved with torch.save) converts to flax and reproduces the torch
activations exactly."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tao_amodal_tpu.models.backbones import ResNet  # noqa: E402
from tao_amodal_tpu.utils.torch_convert import (  # noqa: E402
    convert_resnet,
    load_torch_state_dict,
)


class TorchBottleneck(tnn.Module):
    """torchvision-naming bottleneck (conv1/bn1..conv3/bn3,
    downsample.{0,1})."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet(tnn.Module):
    """torchvision-naming trunk returning stage 2/3/4 feature maps."""

    def __init__(self, stage_sizes=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes, planes = 64, 64
        for s, blocks in enumerate(stage_sizes, start=1):
            layers = []
            for b in range(blocks):
                stride = 1 if s == 1 or b > 0 else 2
                layers.append(TorchBottleneck(
                    inplanes, planes, stride=stride, downsample=(b == 0)))
                inplanes = planes * 4
            setattr(self, f"layer{s}", tnn.Sequential(*layers))
            planes *= 2

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c2 = self.layer2(x)
        c3 = self.layer3(c2)
        c4 = self.layer4(c3)
        return c2, c3, c4


def test_torch_resnet_checkpoint_roundtrip(tmp_path):
    stage_sizes = (1, 1, 1, 1)
    tmodel = TorchResNet(stage_sizes)
    # Realistic BN stats (not the fresh-init identity).
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
    tmodel.eval()

    # Save as a pysot-style checkpoint file (module. prefix + wrapper).
    ckpt = {"state_dict": {"module." + k: v for k, v in
                           tmodel.state_dict().items()},
            "epoch": 20}
    path = tmp_path / "resnet.pth"
    torch.save(ckpt, path)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2)).float())
    t_outs = [o.numpy().transpose(0, 2, 3, 1) for o in t_outs]

    sd = load_torch_state_dict(str(path))
    variables = convert_resnet(sd, stage_sizes=stage_sizes)

    model = ResNet(stage_sizes=stage_sizes, out_stages=(2, 3, 4))
    # Conversion must cover EVERY parameter of the flax model.
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    flat_init = jax.tree_util.tree_leaves(init_vars)
    flat_conv = jax.tree_util.tree_leaves(variables)
    assert len(flat_init) == len(flat_conv)

    j_outs = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)

    for i, (t, j) in enumerate(zip(t_outs, j_outs)):
        np.testing.assert_allclose(np.asarray(j), t, atol=2e-4,
                                   err_msg=f"stage output {i}")


def test_siamese_checkpoint_graft():
    """backbone.+neck.-prefixed tracker checkpoint grafts onto the
    SiameseTracker variables; heads stay initialized; the report says
    exactly what loaded."""
    from tao_amodal_tpu.models.siamese import SiameseTracker
    from tao_amodal_tpu.utils.torch_convert import (
        convert_siamese_checkpoint,
    )

    tmodel = TorchResNet((3, 4, 6, 3))
    sd = {"backbone." + k: v.numpy() for k, v in
          tmodel.state_dict().items()}
    # pysot AdjustAllLayer naming for 3 levels.
    rs = np.random.RandomState(1)
    for i, cin in enumerate((512, 1024, 2048)):
        base = f"neck.downsample{i + 2}.downsample"
        sd[f"{base}.0.weight"] = rs.randn(256, cin, 1, 1).astype(
            np.float32)
        sd[f"{base}.1.weight"] = np.ones(256, np.float32)
        sd[f"{base}.1.bias"] = np.zeros(256, np.float32)
        sd[f"{base}.1.running_mean"] = np.zeros(256, np.float32)
        sd[f"{base}.1.running_var"] = np.ones(256, np.float32)

    model = SiameseTracker(num_levels=3)
    z = jnp.zeros((1, 127, 127, 3))
    xs = jnp.zeros((1, 255, 255, 3))
    seed_vars = model.init(jax.random.PRNGKey(0), template=z,
                           search=xs, mode="train")

    variables, report = convert_siamese_checkpoint(sd, model, seed_vars)
    # The whole trunk + necks must land.
    n_backbone = sum(1 for k in report["loaded"]
                     if "/backbone/" in k)
    n_neck = sum(1 for k in report["loaded"] if "/necks_" in k)
    assert n_backbone >= 4 * 16 * 2  # 16 blocks x >=4 tensors
    assert n_neck == 3 * 5  # 3 necks x (kernel, scale, bias, mean, var)
    assert not report["shape_mismatch"], report["shape_mismatch"]

    # The grafted model must run.
    out = model.apply(variables, template=z, search=xs, mode="train")
    assert np.all(np.isfinite(np.asarray(out["cls"])))


class _TorchFPN(tnn.Module):
    """detectron2-style FPN naming (fpn_lateral{l}/fpn_output{l}/
    top_block.p6/p7); extra levels chain WITHOUT the interior ReLU to
    mirror our FPN (documented deviation in convert_fpn)."""

    def __init__(self, in_channels, features, first_level=3):
        super().__init__()
        self.first = first_level
        for i, c in enumerate(in_channels):
            setattr(self, f"fpn_lateral{first_level + i}",
                    tnn.Conv2d(c, features, 1))
            setattr(self, f"fpn_output{first_level + i}",
                    tnn.Conv2d(features, features, 3, padding=1))
        top = tnn.Module()
        top.p6 = tnn.Conv2d(features, features, 3, stride=2, padding=1)
        top.p7 = tnn.Conv2d(features, features, 3, stride=2, padding=1)
        self.top_block = top

    def forward(self, feats):
        lats = [getattr(self, f"fpn_lateral{self.first + i}")(x)
                for i, x in enumerate(feats)]
        for i in range(len(lats) - 2, -1, -1):
            lats[i] = lats[i] + tnn.functional.interpolate(
                lats[i + 1], scale_factor=2, mode="nearest")
        outs = [getattr(self, f"fpn_output{self.first + i}")(x)
                for i, x in enumerate(lats)]
        p6 = self.top_block.p6(outs[-1])
        p7 = self.top_block.p7(p6)
        return outs + [p6, p7]


class _TorchRPNHead(tnn.Module):
    def __init__(self, features, num_anchors=3):
        super().__init__()
        self.conv = tnn.Conv2d(features, features, 3, padding=1)
        self.objectness_logits = tnn.Conv2d(features, num_anchors, 1)
        self.anchor_deltas = tnn.Conv2d(features, num_anchors * 4, 1)

    def forward(self, feats):
        objs, deltas = [], []
        for x in feats:
            t = tnn.functional.relu(self.conv(x))
            objs.append(self.objectness_logits(t))
            deltas.append(self.anchor_deltas(t))
        return objs, deltas


class _TorchBoxHead(tnn.Module):
    """roi_heads.box_head + box_predictor naming; background LAST in
    cls_score (the detectron2 convention convert_box_head rolls)."""

    def __init__(self, in_dim, features, num_classes):
        super().__init__()
        box_head = tnn.Module()
        box_head.fc1 = tnn.Linear(in_dim, features)
        box_head.fc2 = tnn.Linear(features, features)
        self.box_head = box_head
        pred = tnn.Module()
        pred.cls_score = tnn.Linear(features, num_classes + 1)
        pred.bbox_pred = tnn.Linear(features, 4)
        self.box_predictor = pred

    def forward(self, pooled):  # [R, C, 7, 7]
        x = pooled.flatten(1)
        x = tnn.functional.relu(self.box_head.fc1(x))
        x = tnn.functional.relu(self.box_head.fc2(x))
        return self.box_predictor.cls_score(x), \
            self.box_predictor.bbox_pred(x)


def test_full_detector_checkpoint_conversion():
    """Every layer of a GTR-style R50+FPN detector state_dict converts
    with end-to-end activation parity (VERDICT r2 item 10)."""
    from tao_amodal_tpu.models.detector import ClipDetector, RoIBoxHead
    from tao_amodal_tpu.models.fpn import FPN
    from tao_amodal_tpu.models.rpn import RPNHead
    from tao_amodal_tpu.utils.torch_convert import (
        convert_box_head,
        convert_detector_checkpoint,
        convert_fpn,
        convert_rpn_head,
    )

    stage_sizes = (1, 1, 1, 1)
    feat, ncls, pool = 64, 7, 7
    torch.manual_seed(0)

    class TorchDetector(tnn.Module):
        def __init__(self):
            super().__init__()
            backbone = tnn.Module()
            backbone.bottom_up = TorchResNet(stage_sizes)
            self.backbone = backbone
            self.fpn = _TorchFPN((512, 1024, 2048), feat)
            prop = tnn.Module()
            prop.rpn_head = _TorchRPNHead(feat)
            self.proposal_generator = prop
            self.roi_heads = _TorchBoxHead(pool * pool * feat, 128,
                                           ncls)

    tdet = TorchDetector()
    with torch.no_grad():
        for m in tdet.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    tdet.eval()
    # detectron2 puts the fpn under backbone.* in checkpoints.
    sd = {("backbone." + k[len("fpn."):] if k.startswith("fpn.")
           else k): v for k, v in tdet.state_dict().items()}

    rs = np.random.RandomState(0)
    x = rs.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).float()
        c2, c3, c4 = tdet.backbone.bottom_up(tx)
        t_pyr = tdet.fpn([c2, c3, c4])
        t_objs, t_deltas = tdet.proposal_generator.rpn_head(t_pyr)
        pooled_t = torch.from_numpy(
            rs.rand(5, feat, pool, pool).astype(np.float32))
        t_cls, t_box = tdet.roi_heads(pooled_t)

    sd = {k: v.numpy() for k, v in sd.items()}
    from tao_amodal_tpu.utils.torch_convert import convert_resnet

    trunk_v = convert_resnet(sd, stage_sizes,
                             prefix="backbone.bottom_up.")
    fpn_v = convert_fpn(sd)
    rpn_v = convert_rpn_head(sd)
    head_v = convert_box_head(sd, ncls, pool_hw=pool, channels=feat)

    # Flax forward chain with the converted weights.
    from tao_amodal_tpu.models.backbones import ResNet

    j_trunk = ResNet(stage_sizes=stage_sizes, out_stages=(2, 3, 4))
    j_feats = j_trunk.apply(trunk_v, jnp.asarray(x), train=False)
    for tt, jj in zip((c2, c3, c4), j_feats):
        np.testing.assert_allclose(
            np.asarray(jj), tt.numpy().transpose(0, 2, 3, 1),
            atol=2e-4)

    j_fpn = FPN(features=feat, num_extra_levels=2)
    j_pyr = j_fpn.apply({"params": fpn_v["params"]}, j_feats)
    for i, (tt, jj) in enumerate(zip(t_pyr, j_pyr)):
        np.testing.assert_allclose(
            np.asarray(jj), tt.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, err_msg=f"fpn level {i}")

    j_rpn = RPNHead(num_anchors=3, features=feat)
    j_objs, j_deltas = j_rpn.apply({"params": rpn_v["params"]}, j_pyr)
    for i, (tt, jj) in enumerate(zip(t_objs, j_objs)):
        np.testing.assert_allclose(
            np.asarray(jj), tt.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, err_msg=f"rpn obj level {i}")
    for i, (tt, jj) in enumerate(zip(t_deltas, j_deltas)):
        np.testing.assert_allclose(
            np.asarray(jj), tt.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, err_msg=f"rpn delta level {i}")

    j_head = RoIBoxHead(ncls, features=128)
    pooled_j = pooled_t.numpy().transpose(0, 2, 3, 1)
    logits, boxd, _ = j_head.apply({"params": head_v["params"]},
                                   jnp.asarray(pooled_j))
    # Background-roll contract: our index 0 == torch's last column.
    t_cls_np = t_cls.numpy()
    want = np.concatenate([t_cls_np[:, -1:], t_cls_np[:, :-1]], axis=1)
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4)
    np.testing.assert_allclose(np.asarray(boxd), t_box.numpy(),
                               atol=2e-4)

    # Graft covers EVERY leaf of the full ClipDetector variables.
    det = ClipDetector(num_classes=ncls, backbone_stages=stage_sizes,
                       features=feat, num_dets=8, num_proposals=16)
    seed_vars = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)))
    converted = convert_detector_checkpoint(sd, ncls,
                                            stage_sizes=stage_sizes)
    n_seed = len(jax.tree_util.tree_leaves(seed_vars))
    n_conv = len(jax.tree_util.tree_leaves(converted))
    assert n_seed == n_conv, (n_seed, n_conv)
