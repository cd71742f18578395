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
