"""Video weight import: frame-feature parity vs an independent torch model."""

import numpy as np
import jax.numpy as jnp
import pytest


def _torch_lipreading_frontend_trunk(torch, layers=(2, 2, 2, 2)):
    """Independent torch model with the reference Lipreading state_dict
    layout for the extract_feats path (frontend3D + trunk)."""
    nn = torch.nn

    class Block(nn.Module):
        def __init__(self, cin, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu1 = nn.PReLU(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.relu2 = nn.PReLU(planes)
            self.downsample = None
            if stride != 1 or cin != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            h = self.relu1(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return self.relu2(h + r)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            cin = 64
            for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers), 1):
                blocks = []
                for i in range(n):
                    blocks.append(Block(cin, planes, 2 if (i == 0 and stage > 1) else 1))
                    cin = planes
                setattr(self, f"layer{stage}", nn.Sequential(*blocks))

        def forward(self, x):
            for stage in range(1, 5):
                x = getattr(self, f"layer{stage}")(x)
            return torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.frontend3D = nn.Sequential(
                nn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
                nn.BatchNorm3d(64),
                nn.PReLU(64),
                nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            )
            self.trunk = Trunk()

        def frame_features(self, x):  # x: (B, 1, T, H, W)
            b = x.shape[0]
            h = self.frontend3D(x)
            t = h.shape[2]
            h = h.transpose(1, 2).reshape(b * t, h.shape[1], h.shape[3], h.shape[4])
            f = self.trunk(h)
            return f.reshape(b, t, -1)

    return Net().eval()


def test_lipreading_frame_feature_parity():
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_import import import_lipreading_state_dict
    from deeplip_tpu.models.lipreading import Lipreading

    tnet = _torch_lipreading_frontend_trunk(torch)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    params, stats = import_lipreading_state_dict(tnet.state_dict())

    import jax

    model = Lipreading(num_classes=4, extract_feats=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 1)))
    merged_p = {**variables["params"], **params}
    merged_s = {**variables["batch_stats"], **stats}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 48, 48)).astype(np.float32)
    with torch.no_grad():
        want = tnet.frame_features(torch.tensor(x)[:, None]).numpy()
    got = model.apply(
        {"params": merged_p, "batch_stats": merged_s},
        jnp.asarray(x)[..., None],
        method=model.frame_features,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
